#!/usr/bin/env python3
"""End-to-end PySpark proof of the graft river binding (B1).

Round-trips the reference tutorial's flow (docs/tutorial.rst:
write -> inspect -> tail -> read -> ingest) from Python, then drives
the LLM-pipeline operator plane through the JVM bridge:

  1. write a deterministic 5000-row stream via df.write.format("river")
  2. metadata get/set, list_streams
  3. tail() returns the newest sample
  4. seek/read_from prunes to the seek point (pushed-down filter)
  4b. read_stream() AvailableNow drain sees all N rows (streaming plane)
  5. ingest_once() persists to parquet; the queried result matches a
     PINNED sha256 (the driver-checkable correctness gate)
  6. minhash_near_dups() finds exactly the planted near-duplicates
  6a. token_stats()/quality_features() match exact Python replicas
  6b. sweep() ingests every pattern-matched stream in one orchestrated
      pass (I1)
  7. the durable ANN serving lifecycle, oracle-exact vs a pure-Python
     brute force: build -> ceiling serve -> append (flips every top-1
     by construction) -> tombstone delete -> maintain_index leaves
     results identical
  8. pack_sequences matches an exact Python replica of the pack rule
  9. the st17 composition: a STREAM of embedding batches feeds the
     index via foreachBatch, then the ceiling serve equals the brute
     force over build + every streamed batch

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

        # -- 6a. text analysis: token_stats vs an exact Python replica
        # (ws tokens, the BPE-ish regex segmentation, chars/4)
        import re as _re
        tok_re = _re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")
        want_t = {r[0]: (len(r[1].split(" ")),
                         len(tok_re.findall(r[1])),
                         len(r[1]) // 4)
                  for r in docs.collect()}
        got_t = {r["id"]: (r["ws_tokens"], r["re_tokens"],
                           r["est_llm_tokens"])
                 for r in gr.token_stats(docs, "doc_id",
                                         "text").collect()}
        check("token_stats", got_t == want_t,
              {"got": got_t, "want": want_t})
        qf = {r["id"]: r for r in gr.quality_features(
            docs, "doc_id", "text", ["the", "over", "and", "about"],
            min_chars=10, min_words=5).collect()}
        check("quality_features",
              all(qf[i]["is_quality"] for i in (1, 2, 3, 4))
              and abs(qf[1]["stopword_ratio"] - 3.0 / 10) < 1e-12,
              {i: (qf[i]["n_words"], qf[i]["stopword_ratio"])
               for i in qf})

        # -- 6b. multi-stream orchestrated sweep (I1) from Python
        for nm, k in (("ev_a", 40), ("ev_b", 25)):
            d2 = spark.createDataFrame(
                [(i, float(i)) for i in range(k)], "a long, b double") \
                .repartition(1).sortWithinPartitions("a")
            gr.write(d2, store, nm)
        out2 = tempfile.mkdtemp(prefix="graft-e2e-sweep-")
        swept = gr.sweep(spark, store, out2, pattern="ev_.*",
                         parallelism=2)
        check("sweep", swept == {"ev_a": 40, "ev_b": 25}, swept)
        n_b = spark.read.parquet(
            os.path.join(out2, "ev_b", "data.parquet")).count()
        check("sweep_persisted", n_b == 25, n_b)
        shutil.rmtree(out2, ignore_errors=True)

        # -- 7. durable ANN serving lifecycle from Python: build ->
        # ceiling serve vs a Python brute force -> append -> delete ->
        # one-pass maintenance leaves results identical. Vector
        # components are small integers so the engine's 1e-6
        # quantization is exact and the Python oracle is bit-honest.
        dim = 8

        def vec(i):
            # integer components so the engine's 1e-6 quantization is
            # exact; LCG-mixed so no two ids share a vector and top-k
            # cosine margins are decisive (a modular family here
            # produced EXACT duplicates -> ties -> undefined ordering)
            return [float((i * 1103515245 + j * 12345 + 6789) % 2001
                          - 1000) for j in range(dim)]

        # id -> vector for everything ever indexed; appended ids
        # 201..204 carry EXACT COPIES of the query vectors (parity
        # matched), so the append MUST flip every query's top-1 --
        # without this the append check passes vacuously
        qids = [101, 102, 103, 104]
        corpus = list(range(64))
        appended = list(range(200, 210))
        vecs = {i: vec(i) for i in corpus + appended + qids}
        for q in qids:
            vecs[q + 100] = vec(q)

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return num / (na * nb) if na > 0 and nb > 0 else None

        def brute_top3(qid, corpus_ids):
            q = vecs[qid]
            scored = sorted(((cos(q, vecs[i]), i) for i in corpus_ids
                             if i % 2 == qid % 2),
                            key=lambda t: (-t[0], t[1]))
            return [i for _, i in scored[:3]]

        def serve_top3(qdf, index_dir):
            out = gr.query_ivfpq_index(
                qdf, "vid", "emb", "key", index_dir, k=3, nprobe=4,
                rerank_depth=1000000)
            got = {}
            for r in out.collect():
                got.setdefault(r["qid"], []).append(
                    (r["neighbor_id"], r["cosine"]))
            return {q: [i for i, _ in sorted(ns, key=lambda t: (-t[1], t[0]))]
                    for q, ns in got.items()}

        idx = tempfile.mkdtemp(prefix="graft-e2e-idx-") + "/ann"
        vdf = spark.createDataFrame(
            [(i, vecs[i], f"k{i % 2}") for i in corpus],
            "vid long, emb array<double>, key string")
        gr.build_ivfpq_index(vdf, "vid", "emb", "key", idx, cells=4)
        qdf = spark.createDataFrame(
            [(i, vecs[i], f"k{i % 2}") for i in qids],
            "vid long, emb array<double>, key string")
        got = serve_top3(qdf, idx)
        want = {q: brute_top3(q, corpus) for q in qids}
        check("ann_build_serve", got == want, {"got": got, "want": want})

        gr.append_ivfpq_index(
            spark.createDataFrame(
                [(i, vecs[i], f"k{i % 2}") for i in appended],
                "vid long, emb array<double>, key string"),
            "vid", "emb", "key", idx, batch_id=1)
        got = serve_top3(qdf, idx)
        want = {q: brute_top3(q, corpus + appended) for q in qids}
        check("ann_append_visible", got == want,
              {"got": got, "want": want})

        doomed = [want[qids[0]][0], want[qids[1]][0]]
        gr.delete_from_index(
            spark.createDataFrame([(i,) for i in doomed], "vid long"),
            "vid", idx, batch_id=2)
        live = [i for i in corpus + appended if i not in doomed]
        want = {q: brute_top3(q, live) for q in qids}
        got = serve_top3(qdf, idx)
        check("ann_delete_hides", got == want, {"got": got, "want": want})

        gr.maintain_index(spark, idx, vacuum=True)
        check("ann_maintain_identical", serve_top3(qdf, idx) == want)

        # -- 8. trainer handoff: pack_sequences vs an exact Python
        # replica of the pack rule (pack_id = (cum - toks) div budget
        # in ord order per group)
        docs_p = [(g, i, (i * 3) % 7 + 1)
                  for g in ("a", "b") for i in range(50)]
        pdf = spark.createDataFrame(
            docs_p, "grp string, ord long, toks long")
        got_p = {(r["group"], r["pack_id"]): (r["n_docs"], r["n_tokens"])
                 for r in gr.pack_sequences(
                     pdf, "grp", "ord", "toks", 10).collect()}
        want_p = {}
        for g in ("a", "b"):
            cum = 0
            for i in range(50):
                t = (i * 3) % 7 + 1
                cum += t
                kdoc = (g, (cum - t) // 10)
                n, s = want_p.get(kdoc, (0, 0))
                want_p[kdoc] = (n + 1, s + t)
        check("pack_sequences", got_p == want_p,
              {"got": len(got_p), "want": len(want_p)})

        # -- 9. the st17 composition from Python: a STREAM of embedding
        # batches feeds the durable index via foreachBatch, then the
        # ceiling serve must equal the brute force over build + every
        # streamed batch (the training-pipeline shape a Python job
        # actually schedules)
        idx2 = tempfile.mkdtemp(prefix="graft-e2e-idx2-") + "/ann"
        gr.build_ivfpq_index(vdf, "vid", "emb", "key", idx2, cells=4)
        newdir = tempfile.mkdtemp(prefix="graft-e2e-new-")
        spark.createDataFrame(
            [(i, vecs[i], f"k{i % 2}") for i in appended],
            "vid long, emb array<double>, key string") \
            .repartition(3).write.mode("overwrite").parquet(newdir)

        def _append(batch_df, bid):
            if batch_df.count() > 0:
                gr.append_ivfpq_index(batch_df, "vid", "emb", "key",
                                      idx2, bid + 1)

        cp2 = tempfile.mkdtemp(prefix="graft-e2e-cp2-")
        q2 = (spark.readStream.schema(vdf.schema)
              .option("maxFilesPerTrigger", 1).parquet(newdir)
              .writeStream.foreachBatch(_append)
              .option("checkpointLocation", cp2)
              .trigger(availableNow=True).start())
        check("stream_append_drained", q2.awaitTermination(300))
        got = serve_top3(qdf, idx2)
        want_s = {q: brute_top3(q, corpus + appended) for q in qids}
        check("stream_append_serve", got == want_s,
              {"got": got, "want": want_s})
        shutil.rmtree(cp2, ignore_errors=True)
        shutil.rmtree(newdir, ignore_errors=True)

        # -- 10. binary planes through the binding (round-15 ask #6):
        # a VARIABLE_WIDTH_BYTES stream (the sizes contract -- each
        # sample carries its own length) and a FIXED_WIDTH_BYTES column,
        # written via the declared-schema option, read back bytes-exact,
        # and the newest sample round-tripping base64 through tail()
        import base64
        var_payloads = [bytes([i] * (i + 1)) for i in range(40)]
        vw_schema = json.dumps({"field_definitions": [
            {"name": "blob", "size": 64, "type": "VARIABLE_WIDTH_BYTES"}]})
        vdf_b = spark.createDataFrame(
            [(bytearray(b),) for b in var_payloads], "blob binary")             .repartition(1)
        gr.write(vdf_b, store, "vw", schema_json=vw_schema)
        got_b = [bytes(r["blob"]) for r in
                 gr.read(spark, store, "vw").orderBy("sample_index")
                   .collect()]
        check("varwidth_roundtrip", got_b == var_payloads,
              {"n": len(got_b)})
        t_vw = gr.tail(spark, store, "vw", timeout_ms=1000)
        check("varwidth_tail_base64",
              base64.b64decode(t_vw["values"][0]) == var_payloads[-1],
              t_vw)

        fw_payloads = [bytes([j, j + 1, j + 2, j + 3]) for j in range(30)]
        fw_schema = json.dumps({"field_definitions": [
            {"name": "tag", "size": 8, "type": "INT64"},
            {"name": "quad", "size": 4, "type": "FIXED_WIDTH_BYTES"}]})
        fdf_b = spark.createDataFrame(
            [(j, bytearray(fw_payloads[j])) for j in range(30)],
            "tag long, quad binary").repartition(1)             .sortWithinPartitions("tag")
        gr.write(fdf_b, store, "fw", schema_json=fw_schema)
        got_f = [(r["tag"], bytes(r["quad"])) for r in
                 gr.read(spark, store, "fw").orderBy("sample_index")
                   .collect()]
        check("fixedwidth_roundtrip",
              got_f == [(j, fw_payloads[j]) for j in range(30)],
              {"n": len(got_f)})
        t_fw = gr.tail(spark, store, "fw", timeout_ms=1000)
        check("fixedwidth_tail_base64",
              t_fw["values"][0] == 29 and
              base64.b64decode(t_fw["values"][1]) == fw_payloads[-1],
              t_fw)

        # -- 11. round-15 operator-plane broadening, each against an
        # exact construction or a pinned engine invariant
        para = " ".join(f"w{i}" for i in range(25))  # one shared block
        docs_txt = [
            (1, para + " " + " ".join(f"x{i}" for i in range(25))),
            (2, para + " " + " ".join(f"y{i}" for i in range(25))),
            (3, " ".join(f"z{i}" for i in range(50))),
        ]
        tdf = spark.createDataFrame(docs_txt, "doc_id long, text string")
        pairs = {(r["doc_a"], r["doc_b"])
                 for r in gr.paragraph_near_dups(
                     tdf, "doc_id", "text", para_words=25,
                     threshold=0.9).collect()}
        check("paragraph_near_dups", pairs == {(1, 2)}, pairs)

        # semantic_near_dups at cells=1 == exact brute-force cosine
        import math as _m
        svecs = {1: [1.0, 0.0, 0.1], 2: [1.0, 0.05, 0.1],
                 3: [0.0, 1.0, 0.0], 4: [0.05, 1.0, 0.0],
                 5: [0.5, 0.5, 0.7]}
        sdf = spark.createDataFrame(
            [(i, v) for i, v in svecs.items()],
            "vid long, emb array<double>")

        def _cos(a, b):
            qa = [round(x * 1e6) for x in a]
            qb = [round(x * 1e6) for x in b]
            dot = sum(x * y for x, y in zip(qa, qb))
            na = _m.sqrt(sum(x * x for x in qa))
            nb = _m.sqrt(sum(x * x for x in qb))
            return dot / (na * nb)

        want_sp = {(a, b) for a in svecs for b in svecs
                   if a < b and _cos(svecs[a], svecs[b]) >= 0.99}
        got_sp = {(r["a"], r["b"]) for r in gr.semantic_near_dups(
            sdf, "vid", "emb", threshold=0.99, cells=1).collect()}
        check("semantic_near_dups", got_sp == want_sp,
              {"got": got_sp, "want": want_sp})

        # epoch_shuffle: 3 epochs x n rows, each epoch a permutation of
        # the ids, and the whole thing deterministic across runs
        edf = spark.createDataFrame([(i,) for i in range(40)],
                                    "doc_id long")
        sh1 = gr.epoch_shuffle(edf, ["doc_id"], epochs=3).collect()
        check("epoch_shuffle_rows", len(sh1) == 120, len(sh1))
        by_epoch = {}
        for r in sh1:
            by_epoch.setdefault(r["epoch"], []).append(r["doc_id"])
        check("epoch_shuffle_permutations",
              all(sorted(v) == list(range(40))
                  for v in by_epoch.values()) and len(by_epoch) == 3)
        sh2 = gr.epoch_shuffle(edf, ["doc_id"], epochs=3).collect()
        key_fn = lambda r: (r["epoch"], r["bucket"], r["pos"])  # noqa: E731
        check("epoch_shuffle_deterministic",
              sorted(map(tuple, sh1)) == sorted(map(tuple, sh2)))

        # corpus_build + funnel: capstone invariants -- every pack under
        # budget, funnel's packed stage == the build's totals
        cb_docs = [(i, " ".join(f"t{i}w{j}" for j in range(30)), "web")
                   for i in range(40)] +                   [(100 + i, " ".join(f"b{i}w{j}" for j in range(30)),
                    "books") for i in range(40)]
        cdf = spark.createDataFrame(cb_docs,
                                    "doc_id long, text string, src string")
        wdf = spark.createDataFrame([("web", 2.0), ("books", 1.0)],
                                    "domain string, w double")
        built = gr.corpus_build(cdf, "doc_id", "text", "src", wdf,
                                "domain", "w", 600, 90).collect()
        check("corpus_build_packs",
              len(built) > 0 and all(r["n_tokens"] <= 90 for r in built),
              {"packs": len(built)})
        fun = {r["stage"]: (r["n_docs"], r["n_tokens"])
               for r in gr.corpus_build_funnel(
                   cdf, "doc_id", "text", "src", wdf, "domain", "w",
                   600, 90).collect()}
        packed_docs = sum(1 for _ in built)
        packed_toks = sum(r["n_tokens"] for r in built)
        last_stage = [k for k in fun if "pack" in k.lower()]
        check("corpus_build_funnel",
              len(last_stage) == 1 and
              fun[last_stage[0]] == (packed_docs, packed_toks),
              {"funnel": fun, "built": (packed_docs, packed_toks)})

        # BPE trio: a tie-free corpus with a known merge sequence, then
        # encode/tokenize consistency (tokenize counts == encode counts,
        # concatenating tokens reproduces each word)
        bdf = spark.createDataFrame([(1, "abab abab"), (2, "abab cd")],
                                    "doc_id long, text string")
        merges = gr.bpe_learn(bdf, "text", merges=2).orderBy("step")                    .collect()
        check("bpe_learn_exact",
              [m["merged"] for m in merges] == ["ab", "abab"],
              [m["merged"] for m in merges])
        mt = gr.bpe_learn(bdf, "text", merges=2)
        enc = {r["id"]: r["n_bpe_tokens"]
               for r in gr.bpe_encode(bdf, "doc_id", "text", mt)
                          .collect()}
        toks = gr.bpe_tokenize(bdf, "doc_id", "text", mt).collect()
        cnt = {}
        for r in toks:
            cnt[r["id"]] = cnt.get(r["id"], 0) + 1
        check("bpe_encode_tokenize_counts", cnt == enc,
              {"tokenize": cnt, "encode": enc})
        # doc 1 = "abab abab" -> one token per word; doc 2 adds c,d
        check("bpe_token_values",
              enc[1] == 2 and enc[2] == 3 and
              sorted(r["token"] for r in toks if r["id"] == 2) ==
              ["abab", "c", "d"], {"enc": enc})

        # -- 12. round-16 operator-plane completion: the query-side
        # operators a Python pipeline reaches for, each vs an exact
        # Python oracle or a pinned engine invariant

        # filtered_topk_ivfpq at the construction ceiling (nprobe =
        # cells, unbounded rerank) == the exact key-scoped brute force.
        # One frame holds corpus + queries; the SQL predicate over the
        # staged `id` column marks the query side. Inline corpus
        # includes the other queries (self excluded), so the oracle
        # scores them too.
        inline_ids = corpus + qids
        fdf = spark.createDataFrame(
            [(i, vecs[i], f"k{i % 2}") for i in inline_ids],
            "vid long, emb array<double>, key string")
        out_f = gr.filtered_topk_ivfpq(
            fdf, "vid", "emb", "key", "id >= 101", k=3, cells=4,
            nprobe=4, rerank_depth=1000000).collect()
        got_f = {}
        for r in out_f:
            got_f.setdefault(r["qid"], []).append(
                (r["neighbor_id"], r["cosine"]))
        got_f = {q: [i for i, _ in sorted(ns, key=lambda t: (-t[1], t[0]))]
                 for q, ns in got_f.items()}
        want_f = {q: brute_top3(q, [i for i in inline_ids if i != q])
                  for q in qids}
        check("filtered_topk_ivfpq_exact", got_f == want_f,
              {"got": got_f, "want": want_f})

        # knn_graph_auto under the broadcast gate: exact kernel,
        # is_approx false on every row, neighbors == brute force
        # (no key scoping -- all-pairs graph)
        kids = list(range(16))
        kdf = spark.createDataFrame(
            [(i, vecs[i]) for i in kids], "vid long, emb array<double>")
        rows_k = gr.knn_graph_auto(kdf, "vid", "emb", k=3).collect()
        check("knn_graph_auto_exact_path",
              all(not r["is_approx"] for r in rows_k), len(rows_k))
        got_k = {}
        for r in rows_k:
            got_k.setdefault(r["src"], []).append(
                (r["neighbor_id"], r["cosine"]))
        got_k = {i: [n for n, _ in sorted(ns, key=lambda t: (-t[1], t[0]))]
                 for i, ns in got_k.items()}
        want_k = {i: [n for _, n in sorted(
            ((cos(vecs[i], vecs[j]), j) for j in kids if j != i),
            key=lambda t: (-t[0], t[1]))[:3]] for i in kids}
        check("knn_graph_auto_neighbors", got_k == want_k,
              {"got": got_k, "want": want_k})

        # perplexity_score vs the exact unigram oracle: nll(w) =
        # -ln(c(w)/total) quantized like the engine (6-decimal), mean
        # per doc
        import math as _mm
        pdocs = [(1, "a a b"), (2, "a c"), (3, "b b b a")]
        ppl_df = spark.createDataFrame(pdocs, "doc_id long, text string")
        words_all = [w for _, t in pdocs for w in t.split(" ")]
        cnts = {w: words_all.count(w) for w in set(words_all)}
        tot = len(words_all)
        q6 = lambda x: round(x * 1e6) / 1e6  # noqa: E731
        want_ppl = {}
        for i, t in pdocs:
            nlls = [q6(-_mm.log(cnts[w] / tot)) for w in t.split(" ")]
            want_ppl[i] = (len(nlls), sum(nlls) / len(nlls))
        got_ppl = {r["id"]: (r["n_words"], r["avg_nll"], r["keep"])
                   for r in gr.perplexity_score(
                       ppl_df, "doc_id", "text", cutoff=1.0).collect()}
        check("perplexity_score_exact",
              all(got_ppl[i][0] == want_ppl[i][0] and
                  abs(float(got_ppl[i][1]) - want_ppl[i][1]) < 1e-5 and
                  got_ppl[i][2] == (want_ppl[i][1] <= 1.0)
                  for i in want_ppl),
              {"got": {k: (v[0], float(v[1]), v[2])
                       for k, v in got_ppl.items()},
               "want": want_ppl})

        # duplicate_spans vs an exact construction: P(10 words) +
        # filler + P in doc 1 duplicates [0,10) and [20,30); doc 2
        # carries P once (cross-doc duplication covers it); doc 3 is
        # all-unique -> (0, 0, 0.0)
        P = " ".join(f"p{i}" for i in range(10))
        ddocs = [
            (1, P + " " + " ".join(f"f{i}" for i in range(10)) + " " + P),
            (2, P + " " + " ".join(f"g{i}" for i in range(10))),
            (3, " ".join(f"u{i}" for i in range(20))),
        ]
        ddf = spark.createDataFrame(ddocs, "doc_id long, text string")
        got_d = {r["id"]: (r["n_words"], r["n_dup_spans"],
                           r["dup_words"], round(r["dup_ratio"], 9))
                 for r in gr.duplicate_spans(
                     ddf, "doc_id", "text", k=10).collect()}
        want_d = {1: (30, 2, 20, round(20 / 30, 9)),
                  2: (20, 1, 10, 0.5),
                  3: (20, 0, 0, 0.0)}
        check("duplicate_spans_exact", got_d == want_d,
              {"got": got_d, "want": want_d})

        # quality_gate: keep == AND of the four surfaced signals on
        # every row, and the signals actually gate -- a diverse
        # long-enough doc keeps, the same corpus under an impossible
        # min_chars drops on is_quality alone
        g_docs = [
            (1, " ".join(f"q{i}" for i in range(120))),
            (2, " ".join(f"r{i}" for i in range(120))),
        ]
        gdf = spark.createDataFrame(g_docs, "doc_id long, text string")
        rows_g = gr.quality_gate(gdf, "doc_id", "text",
                                 ppl_cutoff=100.0).collect()
        conj_ok = all(
            r["keep"] == (r["is_quality"] and r["dup_keep"] and
                          r["rep_keep"] and r["ppl_keep"])
            for r in rows_g)
        check("quality_gate_conjunction",
              conj_ok and len(rows_g) == 2 and
              all(r["keep"] for r in rows_g),
              [(r["id"], r["keep"]) for r in rows_g])
        rows_g2 = gr.quality_gate(gdf, "doc_id", "text",
                                  min_chars=10 ** 6,
                                  ppl_cutoff=100.0).collect()
        check("quality_gate_rejects",
              all((not r["is_quality"]) and (not r["keep"])
                  for r in rows_g2),
              [(r["id"], r["is_quality"], r["keep"]) for r in rows_g2])

        # -- 13. the .pyi stub stays in sync with the runtime module
        # (no mypy in this container, so the check is structural: every
        # public function is stubbed with the same parameter names in
        # the same order, and the stub declares nothing that doesn't
        # exist). This is what a type checker would resolve against.
        import ast
        import inspect
        import os as _os
        pyi = _os.path.join(_os.path.dirname(gr.__file__), "__init__.pyi")
        tree = ast.parse(open(pyi).read())
        stub_sigs = {n.name: [a.arg for a in n.args.args]
                     for n in tree.body
                     if isinstance(n, ast.FunctionDef)}
        mismatches = []
        for name in gr.__all__:
            fn = getattr(gr, name)
            real = list(inspect.signature(fn).parameters)
            if name not in stub_sigs:
                mismatches.append(f"{name}: missing from stub")
            elif stub_sigs[name] != real:
                mismatches.append(
                    f"{name}: stub={stub_sigs[name]} real={real}")
        for name in stub_sigs:
            if name not in gr.__all__:
                mismatches.append(f"{name}: stubbed but not exported")
        check("pyi_stub_sync", not mismatches, mismatches)
        check("py_typed_marker", _os.path.exists(
            _os.path.join(_os.path.dirname(gr.__file__), "py.typed")))

        # -- 13b. type-check the stub as far as this container allows
        # (no mypy/pyright offline — zero egress). Two real static
        # checks a type checker would also run, on top of the
        # structural sync above:
        #   (a) every annotation EXPRESSION in the stub must resolve
        #       against the stub's own imports — an undefined or
        #       misspelled type name (the most common stub rot) fails;
        #   (b) default-argument positions must match the runtime
        #       module, so a stub can't silently promote an optional
        #       parameter to required or vice versa.
        ns: dict = {}
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom, ast.Assign,
                                 ast.AnnAssign)):
                code = compile(ast.Module(body=[node], type_ignores=[]),
                               pyi, "exec")
                exec(code, ns)  # noqa: S102 - our own stub file
        bad_annotations = []
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            annots = [(a.arg, a.annotation) for a in node.args.args
                      if a.annotation is not None]
            annots.append(("return", node.returns))
            for argname, ann in annots:
                if ann is None:
                    bad_annotations.append(
                        f"{node.name}.{argname}: missing annotation")
                    continue
                try:
                    eval(compile(ast.Expression(body=ann), pyi, "eval"),
                         ns)  # noqa: S307 - our own stub file
                except Exception as ex:
                    bad_annotations.append(
                        f"{node.name}.{argname}: {ex}")
        check("pyi_annotations_resolve", not bad_annotations,
              bad_annotations)
        default_drift = []
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef) or \
                    node.name not in gr.__all__:
                continue
            fn = getattr(gr, node.name)
            real_has_default = [
                p.default is not inspect.Parameter.empty
                for p in inspect.signature(fn).parameters.values()]
            n_args = len(node.args.args)
            stub_has_default = [False] * (n_args - len(node.args.defaults)) \
                + [True] * len(node.args.defaults)
            if real_has_default != stub_has_default:
                default_drift.append(
                    f"{node.name}: stub defaults {stub_has_default} "
                    f"vs runtime {real_has_default}")
        check("pyi_default_sync", not default_drift, default_drift)

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
