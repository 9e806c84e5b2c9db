#!/usr/bin/env python3
"""End-to-end PySpark proof of the graft river binding (B1).

Round-trips the reference tutorial's flow (docs/tutorial.rst:
write -> inspect -> tail -> read -> ingest) from Python, then runs one
LLM-pipeline operator through the JVM bridge:

  1. write a deterministic 5000-row stream via df.write.format("river")
  2. metadata get/set, list_streams
  3. tail() returns the newest sample
  4. seek/read_from prunes to the seek point (pushed-down filter)
  4b. read_stream() AvailableNow drain sees all N rows (streaming plane)
  5. ingest_once() persists to parquet; the queried result matches a
     PINNED sha256 (the driver-checkable correctness gate)
  6. minhash_near_dups() finds exactly the planted near-duplicates

Run from the repo root after `sbt compile` (no jar needed):

    python3 python/e2e_river.py

Prints one JSON status line; exit code 0 iff every step passed.
"""

import hashlib
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))

# sha256 over "si,a,b,c" lines of the canonical generator below --
# pinned: any drift in write order, sample indexing, ingest, or parquet
# round-tripping is a hard failure, not a shrug
PINNED_HASH = "4c31871b696bdc06d1b30ec3e91f3f43ff7bcd5acc7c6d829fee805c79894cba"
N = 5000


def canonical_rows():
    return [(i, i, (i * 7) % 100 / 4.0, i % 13) for i in range(N)]


def row_hash(rows):
    lines = [f"{si},{a},{b:.4f},{c}" for (si, a, b, c) in rows]
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main():
    from pyspark.sql import SparkSession, functions as F

    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        print(json.dumps({"status": "fail",
                          "error": f"run `sbt compile` first: {classes}"}))
        return 1

    spark = (SparkSession.builder
             .master("local[4]")
             .appName("graft-river-e2e")
             .config("spark.driver.extraClassPath", classes)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import graft_river as gr

    store = tempfile.mkdtemp(prefix="graft-e2e-store-")
    out = tempfile.mkdtemp(prefix="graft-e2e-out-")
    checks = []

    def check(name, ok, detail=""):
        checks.append((name, bool(ok), detail))
        if not ok:
            raise AssertionError(f"{name}: {detail}")

    try:
        # -- 1. write: stream DDL is the first write (single partition
        # keeps sample order = row order = the canonical generator's)
        rows = [(a, b, c) for (_, a, b, c) in canonical_rows()]
        df = spark.createDataFrame(rows, "a long, b double, c int") \
                  .repartition(1).sortWithinPartitions("a")
        gr.write(df, store, "ev")
        check("write", True)

        # -- 2. metadata plane
        check("list_streams", gr.list_streams(spark, store) == ["ev"])
        gr.set_user_metadata(spark, store, "ev", {"who": "e2e"})
        meta = gr.get_metadata(spark, store, "ev")
        check("metadata", meta["user_metadata"]["who"] == "e2e", meta)

        # -- 3. tail: the newest sample
        t = gr.tail(spark, store, "ev", timeout_ms=1000)
        check("tail", t is not None and t["sample_index"] == N - 1
              and t["values"][0] == N - 1, t)

        # -- 4. seek -> pushed-down read_from
        key1000 = (gr.read(spark, store, "ev")
                   .filter(F.col("sample_index") == 1000)
                   .select("key").head()[0])
        start = gr.seek_index(spark, store, "ev", key1000)
        check("seek_index", start == 1001, start)
        n_after = gr.read_from(spark, store, "ev", key1000).count()
        check("read_from", n_after == N - 1001, n_after)

        # -- 4b. streaming plane: AvailableNow drain of the same stream
        # (the source implements SupportsTriggerAvailableNow, so the
        # drain pins the frontier at start and terminates) -- must run
        # BEFORE ingest: the ingester deletes the store stream at EOF
        cp = tempfile.mkdtemp(prefix="graft-e2e-cp-")
        try:
            q = (gr.read_stream(spark, store, "ev")
                 .writeStream.format("memory").queryName("e2e_stream")
                 .trigger(availableNow=True)
                 .option("checkpointLocation", cp)
                 .start())
            check("read_stream_drained", q.awaitTermination(120))
            n_stream = spark.table("e2e_stream").count()
            check("read_stream_rows", n_stream == N, n_stream)
        finally:
            shutil.rmtree(cp, ignore_errors=True)

        # -- 5. ingest -> parquet -> PINNED hash
        persisted = gr.ingest_once(spark, store, out, "ev")
        check("ingest_rows", persisted == N, persisted)
        got = (spark.read.parquet(os.path.join(out, "ev", "data.parquet"))
               .select("sample_index", "a", "b", "c")
               .orderBy("sample_index").collect())
        h = row_hash([(r[0], r[1], r[2], r[3]) for r in got])
        check("pinned_hash", h == PINNED_HASH, h)
        check("self_hash", row_hash(canonical_rows()) == PINNED_HASH)
        # the ingester completed the stream: sidecar says so, store is
        # trimmed (reference deletes Redis state at EOF)
        side = json.load(open(os.path.join(out, "ev", "metadata.json")))
        check("sidecar", side["ingestion_status"] == "COMPLETED", side)
        check("store_trimmed", gr.list_streams(spark, store) == [])

        # -- 6. operator plane: planted near-dups, exact expectation
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today"),
             (2, "the quick brown fox jumps over the lazy dog tonight"),
             (3, "a completely different sentence about spark engines"),
             (4, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string")
        pairs = sorted((r[0], r[1]) for r in gr.minhash_near_dups(
            docs, "doc_id", "text", shingle_k=3, bands=4, rows=2,
            threshold=0.5).collect())
        check("minhash_pairs",
              (1, 4) in pairs and all(3 not in p for p in pairs), pairs)

        print(json.dumps({"status": "pass",
                          "checks": [c[0] for c in checks],
                          "pinned_hash": PINNED_HASH}))
        return 0
    except Exception as e:  # noqa: BLE001 - single gate, full detail
        print(json.dumps({"status": "fail", "error": str(e),
                          "checks": [(c[0], c[1]) for c in checks]}))
        return 1
    finally:
        spark.stop()
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
