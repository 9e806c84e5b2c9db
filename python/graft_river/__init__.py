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
    "ingest_once", "sweep", "minhash_near_dups",
    "build_ivfpq_index", "append_ivfpq_index", "query_ivfpq_index",
    "delete_from_index", "maintain_index", "pack_sequences",
    "token_stats", "quality_features",
    "paragraph_near_dups", "semantic_near_dups", "epoch_shuffle",
    "corpus_build", "corpus_build_funnel",
    "bpe_learn", "bpe_encode", "bpe_tokenize",
    "filtered_topk_ivfpq", "knn_graph_auto",
    "quality_gate", "perplexity_score", "duplicate_spans",
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


def write(df, root, stream, schema_json=None):
    """Create + append + EOF one stream from a DataFrame (stream DDL is
    the first write, reference writer.cpp:55-60: single writer, write
    once). Rows funnel through one task -- the single-writer stream
    contract -- so order the frame first if order matters.

    schema_json (reference wire format: {"field_definitions":[{"name",
    "size","type"}...]}) DECLARES the river types when Spark's schema
    is ambiguous -- a BinaryType column has no default mapping, so
    FIXED_WIDTH_BYTES(n) / VARIABLE_WIDTH_BYTES(max) streams are
    written by passing it explicitly."""
    w = (df.coalesce(1).write.format("river")
         .option("root", str(root)).option("stream", stream))
    if schema_json is not None:
        w = w.option("schemaJson", schema_json)
    w.mode("append").save()


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
    """One ingester pass (I2-I9): stream -> parquet with derived
    columns, frontier resume, EOF compaction, delete-behind trim.
    Returns rows persisted."""
    return _bridge(spark).ingestOnce(spark._jsparkSession,
                                     str(store_root), str(out_root),
                                     stream)


def sweep(spark, store_root, out_root, pattern=".*", parallelism=1):
    """Multi-stream orchestrated sweep (I1): one ingest pass for every
    stream matching `pattern`, `parallelism` at a time. Returns
    {stream: rows_persisted}."""
    return json.loads(_bridge(spark).sweepJson(
        spark._jsparkSession, str(store_root), str(out_root),
        pattern, int(parallelism)))


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


def paragraph_near_dups(df, id_col, text_col, para_words=25,
                        shingle_k=5, bands=2, rows=8, threshold=0.8):
    """Paragraph-granularity MinHash-LSH near-dup pairs (the d08
    engine): documents tile into para_words-word blocks and the banded
    dedup runs at block granularity -- the C4/Gopher second pass that
    catches boilerplate invisible at whole-document level. Returns
    (doc_a, para_a, doc_b, para_b, similarity)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).paragraphNearDups(
        df._jdf, id_col, text_col, int(para_words), int(shingle_k),
        int(bands), int(rows), float(threshold))
    return DataFrame(jdf, df.sparkSession)


def semantic_near_dups(df, id_col, vec_col, threshold, cells,
                       iters=2):
    """Cell-bucketed semantic near-dup pairs (the s07 engine --
    SemDeDup's shape): k-means cells, then exact within-cell cosine
    pairs >= threshold. Returns (a, b, cosine) with a < b; cross-cell
    pairs are deliberately out of scope (the documented recall
    trade)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).semanticNearDups(
        df._jdf, id_col, vec_col, float(threshold), int(cells),
        int(iters))
    return DataFrame(jdf, df.sparkSession)


# ------------------------------------ durable ANN serving lifecycle

def build_ivfpq_index(df, id_col, vec_col, key_col, index_dir,
                      cells=16, iters=2, pq_m=4, pq_ks=4, pq_iters=2):
    """Build a durable IVF-PQ serving index (the s21 engine): index
    the corpus ONCE, then query_ivfpq_index serves any number of later
    batches. The on-disk layout is the same generation-pointer tree the
    Scala surface reads and maintains -- an index built from Python is
    the same index a Scala job compacts."""
    _bridge(df.sparkSession).buildIvfPqIndex(
        df._jdf, id_col, vec_col, key_col, str(index_dir), int(cells),
        int(iters), int(pq_m), int(pq_ks), int(pq_iters))


def append_ivfpq_index(df, id_col, vec_col, key_col, index_dir,
                       batch_id):
    """Append a committed batch (s22). batch_id must be fresh and
    nonzero (0 is the build's); racing a maintenance pass fails loudly
    at the lock, never silently."""
    _bridge(df.sparkSession).appendIvfPqIndex(
        df._jdf, id_col, vec_col, key_col, str(index_dir),
        int(batch_id))


def query_ivfpq_index(df, id_col, vec_col, key_col, index_dir, k,
                      nprobe=1, rerank_depth=0):
    """Filtered ANN top-k against the stored index: returns a DataFrame
    of (qid, neighbor_id, cosine, ...) rows. nprobe = cells with a
    large rerank_depth is the construction-ceiling exact mode."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).queryIvfPqIndex(
        df._jdf, id_col, vec_col, key_col, str(index_dir), int(k),
        int(nprobe), int(rerank_depth))
    return DataFrame(jdf, df.sparkSession)


def delete_from_index(df, id_col, index_dir, batch_id):
    """Idempotent tombstone batch (s25): rows by id vanish from every
    later serve; the next maintenance pass reclaims them physically."""
    _bridge(df.sparkSession).deleteFromIndex(
        df._jdf, id_col, str(index_dir), int(batch_id))


def maintain_index(spark, index_dir, min_keep_batch_id=None,
                   vacuum=False):
    """One-pass maintenance (s28): expire batches below
    min_keep_batch_id (None = keep all) + compact + optional vacuum in
    ONE lock cycle and ONE generation rewrite."""
    keep = -(1 << 63) if min_keep_batch_id is None \
        else int(min_keep_batch_id)
    _bridge(spark).maintainIndex(spark._jsparkSession, str(index_dir),
                                 keep, bool(vacuum))


def filtered_topk_ivfpq(df, id_col, vec_col, key_col, is_query_sql, k,
                        cells=16, iters=2, nprobe=1, pq_m=4, pq_ks=4,
                        pq_iters=2, rerank_depth=0):
    """Inline filtered ANN top-k with PQ-ADC candidate scoring (the
    s18 engine): cluster + quantize + serve in ONE call, no stored
    index. is_query_sql is a SQL boolean predicate over the staged id
    column, which is always named ``id`` (e.g. "id < 8"): rows
    satisfying it are queries, the rest corpus. rerank_depth <= 0
    defaults to 4k. Returns (qid, neighbor_id, cosine, rank)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).filteredTopKIvfPq(
        df._jdf, id_col, vec_col, key_col, str(is_query_sql), int(k),
        int(cells), int(iters), int(nprobe), int(pq_m), int(pq_ks),
        int(pq_iters), int(rerank_depth))
    return DataFrame(jdf, df.sparkSession)


def knn_graph_auto(df, id_col, vec_col, k,
                   max_broadcast_bytes=512 << 20):
    """All-pairs kNN graph with the measured broadcast/LSH gate: the
    exact broadcast kernel when the corpus fits max_broadcast_bytes,
    the banded-LSH approximate path above it. Every row carries
    is_approx so a consumer -- or an audit later -- knows whether the
    neighbor list is ground truth. Returns
    (src, neighbor_id, cosine, rank, is_approx)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).knnGraphAuto(
        df._jdf, id_col, vec_col, int(k), int(max_broadcast_bytes))
    return DataFrame(jdf, df.sparkSession)


# --------------------------------------------------- text analysis

def token_stats(df, id_col, text_col):
    """Token counting (t03's engine): whitespace tokens, BPE-ish regex
    segments, chars/4 LLM estimate. Pure projection -- no shuffle."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).tokenStats(df._jdf, id_col, text_col)
    return DataFrame(jdf, df.sparkSession)


def quality_features(df, id_col, text_col, stopwords, min_chars=100,
                     min_words=20, min_type_token=0.3):
    """Quality features + is_quality gate (t02's engine): char/word
    counts, mean word length, stopword and type-token ratios."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).qualityFeatures(
        df._jdf, id_col, text_col, [str(w) for w in stopwords],
        int(min_chars), int(min_words), float(min_type_token))
    return DataFrame(jdf, df.sparkSession)


def quality_gate(df, id_col, text_col, min_chars=100, min_words=20,
                 min_type_token=0.3, shingle_k=8, max_dup_ratio=0.5,
                 rep_k=3, max_top_gram_ratio=1.0 / 32,
                 max_dup_word_ratio=0.5, ppl_cutoff=3.402):
    """The four-signal keep/drop gate (the t12 engine): quality
    features AND shingle-dup AND repetition AND perplexity, each
    surfaced as its own keep column so a rejected doc says WHY.
    Returns (id, is_quality, dup_keep, rep_keep, ppl_keep, keep)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).qualityGate(
        df._jdf, id_col, text_col, int(min_chars), int(min_words),
        float(min_type_token), int(shingle_k), float(max_dup_ratio),
        int(rep_k), float(max_top_gram_ratio),
        float(max_dup_word_ratio), float(ppl_cutoff))
    return DataFrame(jdf, df.sparkSession)


def perplexity_score(df, id_col, text_col, cutoff=3.402):
    """Corpus-unigram perplexity scoring (the t16 engine): mean
    negative log-likelihood per doc under the corpus's own unigram
    distribution; keep = avg_nll <= cutoff. Returns
    (id, n_words, avg_nll, keep)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).perplexityScore(
        df._jdf, id_col, text_col, float(cutoff))
    return DataFrame(jdf, df.sparkSession)


def duplicate_spans(df, id_col, text_col, k=10, min_count=2):
    """Within-document duplicated-span statistics (the d09 engine):
    k-gram islands repeated >= min_count times, merged per doc.
    Returns (id, n_words, n_dup_spans, dup_words, dup_ratio)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).duplicateSpans(
        df._jdf, id_col, text_col, int(k), int(min_count))
    return DataFrame(jdf, df.sparkSession)


# --------------------------------------------- trainer handoff plane

def pack_sequences(df, group_col, order_col, tokens_col, budget):
    """Fixed-budget sequence packing (p01's engine): returns one row
    per (group, pack_id) context window with n_docs/n_tokens, packing
    docs in order_col order within group_col under `budget` tokens per
    window. Distributed two-pass cumsum -- no single-task group window
    at any group cardinality."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).packSequences(
        df._jdf, group_col, order_col, tokens_col, int(budget))
    return DataFrame(jdf, df.sparkSession)


def epoch_shuffle(df, key_cols, epochs, buckets=1024):
    """Deterministic multi-epoch shuffle order (the p21 engine): emits
    `epochs` copies of the input, each with its own pseudo-random
    (bucket, pos) order derived from md5 over the key columns; the
    input is pinned so the upstream plan computes ONCE for all
    epochs."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).epochShuffle(
        df._jdf, [str(c) for c in key_cols], int(epochs), int(buckets))
    return DataFrame(jdf, df.sparkSession)


def corpus_build(df, id_col, text_col, source_col, weights,
                 weight_domain_col, weight_col, token_budget,
                 pack_budget):
    """The corpus-build capstone (the p14 engine): quality gate ->
    minhash dedup -> train/val/test split -> decontam against the eval
    split -> weighted mixture sampling -> context-window packing, one
    composed chain. Returns the packed-window table
    (source, pack_id, n_docs, n_tokens) -- what ships to the
    trainer."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).corpusBuild(
        df._jdf, id_col, text_col, source_col, weights._jdf,
        weight_domain_col, weight_col, int(token_budget),
        int(pack_budget))
    return DataFrame(jdf, df.sparkSession)


def corpus_build_funnel(df, id_col, text_col, source_col, weights,
                        weight_domain_col, weight_col, token_budget,
                        pack_budget):
    """corpus_build's per-stage funnel (the p17 engine): one row per
    stage (stage, n_docs, n_tokens) computed from the SAME stage
    frames the build materializes -- a silently dropping stage shows
    up as a number, not a downstream mystery."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).corpusBuildFunnel(
        df._jdf, id_col, text_col, source_col, weights._jdf,
        weight_domain_col, weight_col, int(token_budget),
        int(pack_budget))
    return DataFrame(jdf, df.sparkSession)


# ----------------------------------------------------- BPE tokenizer

def bpe_learn(df, text_col, merges, max_batch=64):
    """Train a BPE merge table (the t14 engine): exact
    frequency-ordered merges with batched rounds; the table is
    vocabulary-bounded, never corpus-sized. Returns a DataFrame
    (step, pair, merged, cnt) -- feed it to bpe_encode /
    bpe_tokenize."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).bpeLearn(df._jdf, text_col,
                                            int(merges), int(max_batch))
    return DataFrame(jdf, df.sparkSession)


def bpe_encode(df, id_col, text_col, merge_table):
    """Price documents under a learned merge table (the t19 engine):
    returns (id, n_words, n_bpe_tokens) with EVERY input row present
    (unseen words segment -- nothing drops)."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).bpeEncode(
        df._jdf, id_col, text_col, merge_table._jdf)
    return DataFrame(jdf, df.sparkSession)


def bpe_tokenize(df, id_col, text_col, merge_table):
    """Token SEQUENCES under a learned merge table (the t20 engine):
    returns (id, word_idx, tok_idx, token) ordering each document's
    full token stream; GROUP BY id COUNT(*) reproduces bpe_encode's
    n_bpe_tokens exactly."""
    from pyspark.sql import DataFrame
    jdf = _bridge(df.sparkSession).bpeTokenize(
        df._jdf, id_col, text_col, merge_table._jdf)
    return DataFrame(jdf, df.sparkSession)
