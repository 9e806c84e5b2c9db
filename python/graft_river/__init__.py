"""PySpark binding for the graft river engine.

The reference engine's primary user surface is its Python binding
(reference python/river.pyx:162-226 dtype bridge, :304-339 buffered
read/write; docs/tutorial.rst is Python-first). On Spark the DataFrame
planes come for free -- ``spark.read.format("river")`` works from
PySpark unchanged because the DSv2 connector lives in the JVM -- so
this module is a thin, documented veneer:

* table planes (read / readStream / write) call the DSv2 source,
* point operations (tail, seek, metadata get/set, list, EOF, delete)
  cross py4j into ``graft.api.PyBridge``,
* pipeline operators (minhash near-dup dedup) pass the JVM plan handle
  (``df._jdf``) across and wrap the JVM result back -- no data ever
  serializes through Python; the whole query stays in Catalyst.

Classpath: the graft classes must be on the driver classpath, e.g.::

    SparkSession.builder.config(
        "spark.driver.extraClassPath", "/path/to/graft/classes-or-jar")

``python/e2e_river.py`` is the runnable round-trip proof.
"""

import json

__all__ = [
    "read", "read_stream", "write", "read_from",
    "list_streams", "get_metadata", "set_user_metadata",
    "delete_stream", "force_eof", "tail", "seek_index",
    "ingest_once", "minhash_near_dups",
]


def _bridge(spark):
    return spark._jvm.graft.api.PyBridge


# --------------------------------------------------------- table planes

def read(spark, root, stream):
    """Batch-read one stream as a DataFrame: derived columns
    (sample_index, key, timestamp_ms) + the stream's user schema.
    sample_index range filters push down to whole-segment pruning."""
    return (spark.read.format("river")
            .option("root", str(root)).option("stream", stream).load())


def read_stream(spark, root, stream):
    """Micro-batch incremental read (Structured Streaming source)."""
    return (spark.readStream.format("river")
            .option("root", str(root)).option("stream", stream).load())


def write(df, root, stream):
    """Create + append + EOF one stream from a DataFrame (stream DDL is
    the first write, reference writer.cpp:55-60: single writer, write
    once). Rows funnel through one task -- the single-writer stream
    contract -- so order the frame first if order matters."""
    (df.coalesce(1).write.format("river")
       .option("root", str(root)).option("stream", stream)
       .mode("append").save())


def read_from(spark, root, stream, key, timeout_ms=0):
    """R4 seek as a table plane: rows strictly AFTER the greatest entry
    <= key, as a pushed-down sample_index filter (the scan skips whole
    segments below the seek point)."""
    start = seek_index(spark, root, stream, key, timeout_ms)
    from pyspark.sql import functions as F
    return read(spark, root, stream).filter(F.col("sample_index") >= start)


# --------------------------------------------------------- point plane

def list_streams(spark, root):
    """M2: stream names under the store root."""
    return json.loads(_bridge(spark).listStreamsJson(str(root)))


def get_metadata(spark, root, stream):
    """M1 get: the full metadata dict (schema json, init time, user
    metadata, clock delta, compression params)."""
    return json.loads(_bridge(spark).metadataJson(str(root), stream))


def set_user_metadata(spark, root, stream, kv):
    """M1 set: replace the user metadata map (str -> str)."""
    _bridge(spark).setUserMetadata(str(root), stream,
                                   {str(k): str(v) for k, v in kv.items()})


def delete_stream(spark, root, stream):
    """M3: drop a stream's segments + metadata."""
    _bridge(spark).deleteStream(str(root), stream)


def force_eof(spark, root, stream):
    """I8: finalize a stream whose writer died without stop()."""
    return _bridge(spark).forceEof(str(root), stream)


def tail(spark, root, stream, timeout_ms=0):
    """R3: newest sample as a dict
    {skipped, key, sample_index, values}, or None."""
    out = _bridge(spark).tailJson(str(root), stream, int(timeout_ms))
    return json.loads(out)


def seek_index(spark, root, stream, key, timeout_ms=0):
    """R4: first sample_index after the greatest entry <= key."""
    return _bridge(spark).seekIndex(str(root), stream, key,
                                    int(timeout_ms))


def ingest_once(spark, store_root, out_root, stream):
    """One ingester sweep (I1-I9): stream -> parquet with derived
    columns, frontier resume, EOF compaction, delete-behind trim.
    Returns rows persisted."""
    return _bridge(spark).ingestOnce(spark._jsparkSession,
                                     str(store_root), str(out_root),
                                     stream)


# ------------------------------------------------------ operator plane

def minhash_near_dups(df, id_col, text_col, shingle_k=5, bands=2,
                      rows=8, threshold=0.8):
    """Banded MinHash-LSH near-duplicate pairs (the d02 engine):
    candidate generation is a band-bucket equi-join, never all-pairs;
    returns a DataFrame (a, b, similarity) with a < b. The plan is
    built and runs entirely in the JVM."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).minhashNearDups(
        df._jdf, id_col, text_col, int(shingle_k), int(bands),
        int(rows), float(threshold))
    return DataFrame(jdf, df.sparkSession)
