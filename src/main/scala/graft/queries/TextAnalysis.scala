package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Pins.PinnedDataset

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, document fingerprinting — the
  * per-document scoring passes of a training-data pipeline.
  *
  * All of these are embarrassingly parallel map-side scans (no shuffle
  * except the final small aggregations), so they scale linearly; the
  * interesting part is keeping every expression engine-portable so the
  * DuckDB oracle hash-matches (single final double divisions, md5-only
  * hashing, regex kept to a dialect-neutral subset).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Tiny per-language marker lexicon for the n-gram/stopword language-ID
    * heuristic. Deterministic toy lexicon over the synthetic corpus vocab;
    * in production this is a few hundred character n-grams per language.
    */
  private val lexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "of" -> "en", "and" -> "en", "in" -> "en",
    "data" -> "de", "stream" -> "de", "batch" -> "de", "key" -> "de",
    "query" -> "es", "row" -> "es", "table" -> "es", "scan" -> "es",
    "join" -> "fr", "merge" -> "fr", "sort" -> "fr", "group" -> "fr",
    "fast" -> "zh", "slow" -> "zh", "small" -> "zh", "value" -> "zh")

  private def sqlLexicon: String =
    lexicon.map { case (w, l) => s"('$w', '$l')" }.mkString(", ")

  private val stopwords = Seq("the", "a", "of", "and", "in", "is", "to")

  val all: Seq[GraftQuery] = Seq(

    // -------------------------------------------------------- language ID
    GraftQuery(
      "t01_langid",
      (s, dir) => {
        import s.implicits._
        // marker-token voting: explode tokens, broadcast-join the lexicon,
        // count votes per (doc, lang), argmax with lang-asc tiebreak.
        // The query IS the TextOps.langId facade call, so the oracle
        // pins the operator users run.
        graft.operators.TextOps.langId(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text",
            lexicon)
          .select($"id".as("doc_id"), $"pred_lang", $"votes")
      },
      Some(s"""
        WITH lex(w, cand_lang) AS (VALUES $sqlLexicon),
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        votes AS (
          SELECT t.doc_id, l.cand_lang, COUNT(*) votes
          FROM tok t JOIN lex l ON t.w = l.w
          GROUP BY 1, 2
        )
        SELECT doc_id, cand_lang AS pred_lang, votes FROM (
          SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY votes DESC, cand_lang ASC) rn
          FROM votes) t
        WHERE rn = 1""")),

    // ----------------------------------------------------- quality scoring
    GraftQuery(
      "t02_quality_score",
      (s, dir) => {
        import s.implicits._
        // The query IS the TextOps.qualityFeatures facade call (the
        // facade computes n_chars = length(text), equal to the table's
        // n_chars column by construction), so the oracle pins the
        // operator users run.
        graft.operators.TextOps.qualityFeatures(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text",
            stopwords)
          .select($"id".as("doc_id"), $"n_chars", $"n_words",
            $"mean_word_len", $"stopword_ratio", $"type_token_ratio",
            $"is_quality")
      },
      Some {
        val stopList = stopwords.map(w => s"'$w'").mkString(", ")
        s"""
        SELECT doc_id, n_chars,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(n_chars - (len(ws) - 1) AS DOUBLE) / len(ws) AS mean_word_len,
          CAST(len(list_filter(ws, w -> w IN ($stopList))) AS DOUBLE) / len(ws)
            AS stopword_ratio,
          CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
            AS type_token_ratio,
          (n_chars >= 100 AND len(ws) >= 20 AND
            CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.3)
            AS is_quality
        FROM (SELECT doc_id, n_chars, string_split(text, ' ') ws
              FROM documents)"""
      }),

    // ------------------------------------------------------ token counting
    GraftQuery(
      "t03_token_stats",
      (s, dir) => {
        import s.implicits._
        // whitespace tokens + a BPE-ish regex segmentation (letter runs /
        // digit runs / single other chars — dialect-neutral regex) + a
        // crude chars/4 "llm token" estimate. The query IS the
        // TextOps.tokenStats facade call (chars/4 over length(text) ==
        // the table's n_chars by construction).
        graft.operators.TextOps.tokenStats(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text")
          .select($"id".as("doc_id"), $"ws_tokens", $"re_tokens",
            $"est_llm_tokens")
      },
      Some("""
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
          CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
            AS BIGINT) AS re_tokens,
          CAST(floor(n_chars / 4) AS BIGINT) AS est_llm_tokens
        FROM documents""")),

    GraftQuery(
      "t04_vocab_topk",
      (s, dir) => {
        import s.implicits._
        // corpus-level vocabulary: top-20 tokens by frequency. Map-side
        // partial aggregation then a 20-row TakeOrdered — no full sort.
        // The query IS the TextOps.vocabTopK facade call.
        graft.operators.TextOps.vocabTopK(
          docs(s, dir).select($"text"), "text", 20)
      },
      Some("""
        SELECT w, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
        GROUP BY w ORDER BY cnt DESC, w ASC LIMIT 20""")),

    // -------------------------------------------------- doc fingerprinting
    GraftQuery(
      "t05_fingerprint",
      (s, dir) => {
        import s.implicits._
        // two fingerprints per doc: full-content md5 (exact dedup key) and
        // a winnowing-style min-shingle fingerprint (stable under small
        // edits: the min 8-gram hash usually survives a few changed words,
        // so near-identical docs collide). Rolling-hash winnowing at scale
        // keeps one min per window; the min-over-all-shingles variant here
        // is its coarsest setting and stays engine-portable. The shingle
        // mins come from the compiled TextKernels pass — the Catalyst HOF
        // spelling ran interpreted AND re-evaluated the inner split per
        // shingle position (O(words^2) per doc, minutes single-threaded).
        // The query IS the TextOps.fingerprints facade call.
        graft.operators.TextOps.fingerprints(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text",
            shingleK = 8)
          .select($"id".as("doc_id"), $"fp_exact", $"fp_winnow")
      },
      Some("""
        SELECT doc_id, md5(text) AS fp_exact,
          list_min(list_transform(
            CASE WHEN len(ws) >= 8
              THEN list_distinct([array_to_string(ws[i+1:i+8], ' ')
                                  for i in range(len(ws)-7)])
              ELSE [array_to_string(ws, ' ')] END,
            g -> md5(g))) AS fp_winnow
        FROM (SELECT doc_id, text, string_split(text, ' ') ws
              FROM documents)""")),

    GraftQuery(
      "t06_fingerprint_clusters",
      (s, dir) => {
        import s.implicits._
        // near-dup clusters = docs sharing a winnow fingerprint (computed
        // by the compiled TextKernels pass, see t05); the groupBy key is
        // an md5 (uniform), so the shuffle cannot skew.
        graft.functions.TextKernels.winnowFingerprints(
            s, docs(s, dir).repartition(32, $"doc_id"), 8)
          .groupBy($"fp_winnow")
          .agg(count(lit(1)).as("cluster_size"),
            min($"doc_id").as("keep_doc_id"))
          .filter($"cluster_size" >= 2)
      },
      Some("""
        WITH fp AS (
          SELECT doc_id,
            list_min(list_transform(
              CASE WHEN len(ws) >= 8
                THEN list_distinct([array_to_string(ws[i+1:i+8], ' ')
                                    for i in range(len(ws)-7)])
                ELSE [array_to_string(ws, ' ')] END,
              g -> md5(g))) AS fp_winnow
          FROM (SELECT doc_id, text, string_split(text, ' ') ws
                FROM documents))
        SELECT fp_winnow, COUNT(*) AS cluster_size,
               MIN(doc_id) AS keep_doc_id
        FROM fp GROUP BY fp_winnow HAVING COUNT(*) >= 2""")),

    // ------------------------------------------------- corpus n-gram stats
    GraftQuery(
      "t07_bigram_stats",
      (s, dir) => {
        import s.implicits._
        // Corpus bigram statistics: top-20 adjacent word pairs by raw
        // occurrence count, with document frequency — the n-gram
        // frequency table LM data work reads before choosing tokenizer
        // merges or boilerplate cuts. Two-level aggregate, NOT
        // count+countDistinct in one agg: that spelling expands every
        // exploded bigram row 2x through the shuffle, while
        // per-(bigram, doc) partial counts combine map-side and the
        // shuffle carries only distinct (bigram, doc) pairs. The final
        // top-k is a bounded TakeOrdered (no full sort), ties broken
        // bigram-ascending so the cutoff is deterministic.
        // Bigram extraction runs in the compiled TextKernels pass: the
        // declarative transform/sequence spelling is an interpreted HOF
        // that re-evaluates split(text) per element — it was this
        // query's entire cost at sf0.1.
        graft.functions.TextKernels
          .bigramPairs(s, docs(s, dir).select($"doc_id", $"text"))
          .groupBy($"bigram", $"doc_id")
          .agg(count(lit(1)).as("c"))
          .groupBy($"bigram")
          .agg(sum($"c").as("cnt"), count(lit(1)).as("doc_freq"))
          .orderBy($"cnt".desc, $"bigram".asc)
          .limit(20)
      },
      Some("""
        WITH ws AS (
          SELECT doc_id, string_split(text, ' ') ws FROM documents
        ),
        bg AS (
          SELECT doc_id,
            unnest([array_to_string(ws[i+1:i+2], ' ')
                    for i in range(len(ws) - 1)]) AS bigram
          FROM ws WHERE len(ws) >= 2
        )
        SELECT bigram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS doc_freq
        FROM bg GROUP BY 1
        ORDER BY cnt DESC, bigram ASC LIMIT 20""")),

    // --------------------------------------- corpus-duplicate n-gram ratio
    GraftQuery(
      "t08_dup_ngram_ratio",
      (s, dir) => {
        import s.implicits._
        // The Gopher/C4-style dedup-quality signal: for each document,
        // the fraction of its distinct 8-gram shingles that also occur in
        // at least one OTHER document, plus a keep flag (ratio <= 0.5).
        // Unlike the pairwise dedups (d02-d06) this scores every document
        // against the WHOLE corpus in aggregate: explode shingles -> df
        // count (map-side combinable, shuffles on the uniform shingle
        // hash) -> join back on shingle -> per-doc agg on doc_id. Two
        // bucketed shuffles total, both on high-cardinality keys; the
        // keep decision stays in exact integer arithmetic (2*dup <= n)
        // so no float threshold can diverge between engines.
        val shArr = graft.functions.TextKernels
          .shingleArrays(s,
            docs(s, dir).repartition(32, $"doc_id").pin(), 8)
          .pin()
        val sh = shArr.select($"doc_id", explode($"shs").as("sh"))
        val dfreq = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        sh.join(dfreq, Seq("sh"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when($"df" > 1, 1L).otherwise(0L)).as("dup_shingles"))
          .select($"doc_id", $"n_shingles", $"dup_shingles",
            ($"dup_shingles".cast("double") / $"n_shingles").as("dup_ratio"),
            when($"dup_shingles" * 2 <= $"n_shingles", 1).otherwise(0)
              .as("keep"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, unnest(${Dedup.sqlShingles(8)}) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') ws FROM documents)
        ),
        dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1)
        SELECT s.doc_id,
          COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS dup_shingles,
          CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS dup_ratio,
          CASE WHEN CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 * 2 <= COUNT(*) THEN 1 ELSE 0 END AS keep
        FROM sh s JOIN dfreq d ON s.sh = d.sh
        GROUP BY s.doc_id""")),

    // --------------------------------------- intra-document repetition
    GraftQuery(
      "t09_repetition_score",
      (s, dir) => {
        import s.implicits._
        // Gopher-style intra-document repetition filter: a doc whose
        // most-frequent word 3-gram covers too much of the doc, or whose
        // words are mostly repeats, is boilerplate/spam. Two signals per
        // doc: top-3-gram share (max gram count / total grams) and
        // duplicate-word ratio (1 - distinct/total). Both are per-doc
        // map-then-narrow-agg passes keyed on doc_id — embarrassingly
        // parallel at any corpus size; the only shuffles carry one row
        // per (doc, gram) partial and one skinny row per doc. The keep
        // decision is exact integer arithmetic (top*32 <= n, dup*2 <= n;
        // thresholds sit at the corpus p75/median so the flag is
        // discriminative), immune to float divergence between engines.
        val base = docs(s, dir).select($"doc_id", split($"text", " ").as("ws"))
        // docs under 3 words score their whole text as a single gram so
        // every doc is covered (t05's short-doc convention)
        val grams = base.select($"doc_id", explode(
          when(size($"ws") >= 3, expr(
            "transform(sequence(0, size(ws) - 3), " +
              "i -> concat_ws(' ', element_at(ws, i + 1), " +
              "element_at(ws, i + 2), element_at(ws, i + 3)))"))
            .otherwise(array(array_join($"ws", " ")))).as("g"))
        val rep = grams.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(max($"c").as("top_gram_c"), sum($"c").as("n_grams"))
        val words = base.select($"doc_id",
          size($"ws").cast("long").as("n_words"),
          (size($"ws") - size(array_distinct($"ws"))).cast("long")
            .as("dup_words"))
        words.join(rep, Seq("doc_id"))
          .select($"doc_id", $"n_words", $"dup_words",
            $"top_gram_c", $"n_grams",
            ($"top_gram_c".cast("double") / $"n_grams").as("top_gram_ratio"),
            ($"dup_words".cast("double") / $"n_words").as("dup_word_ratio"),
            when($"top_gram_c" * 32 <= $"n_grams" &&
              $"dup_words" * 2 <= $"n_words", 1).otherwise(0).as("keep"))
      },
      Some("""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        g AS (
          SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
            THEN [array_to_string(ws[i+1:i+3], ' ')
                  for i in range(len(ws) - 2)]
            ELSE [array_to_string(ws, ' ')] END) AS g
          FROM ws),
        rep AS (
          SELECT doc_id, MAX(c) AS top_gram_c,
                 CAST(SUM(c) AS BIGINT) AS n_grams
          FROM (SELECT doc_id, g, COUNT(*) c FROM g GROUP BY 1, 2) t
          GROUP BY 1),
        w AS (
          SELECT doc_id, CAST(len(ws) AS BIGINT) n_words,
                 CAST(len(ws) - len(list_distinct(ws)) AS BIGINT) dup_words
          FROM ws)
        SELECT w.doc_id, n_words, dup_words, top_gram_c, n_grams,
          CAST(top_gram_c AS DOUBLE) / n_grams AS top_gram_ratio,
          CAST(dup_words AS DOUBLE) / n_words AS dup_word_ratio,
          CASE WHEN top_gram_c * 32 <= n_grams
                AND dup_words * 2 <= n_words THEN 1 ELSE 0 END AS keep
        FROM w JOIN rep ON w.doc_id = rep.doc_id""")),

    // ------------------------------------------------- PII scrub/redact
    GraftQuery(
      "t10_pii_redact",
      (s, dir) => {
        import s.implicits._
        // PII detection + redaction: count and mask emails, phone numbers
        // and IPv4 addresses. The synthetic corpus contains none, so the
        // query grafts deterministic PII spans onto each doc (a pure
        // function of doc_id) before scrubbing — the redaction itself is
        // what's under test. Regexes stay in the dialect-neutral subset
        // (char classes + bounded repetition, no lookaround/backrefs) so
        // Java regex and DuckDB's RE2 match identically. Pure map-side
        // row-at-a-time work: zero shuffles, linear at any corpus size.
        // The scrub itself IS the TextOps.piiScrub facade call over the
        // decorated frame, so the oracle pins the operator users run.
        val decorated = concat($"text",
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail"), ($"doc_id" % 10).cast("string"), lit(".com"),
          when($"doc_id" % 3 === 0, lit(" cc admin@site.org"))
            .otherwise(lit("")),
          lit(" call 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
          lit("."), ($"doc_id" * 7 % 256).cast("string"))
        graft.operators.TextOps.piiScrub(
            docs(s, dir).select($"doc_id", decorated.as("decorated")),
            "doc_id", "decorated")
          .select($"id".as("doc_id"), $"n_emails", $"n_phones",
            $"n_ips", md5($"redacted").as("redacted_md5"))
      },
      Some("""
        WITH dec AS (
          SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
              || CAST(doc_id % 10 AS VARCHAR) || '.com'
              || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@site.org'
                 ELSE '' END
              || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST(doc_id * 7 % 256 AS VARCHAR) AS decorated
          FROM documents
        ),
        red AS (
          SELECT doc_id, decorated,
            regexp_replace(
              regexp_replace(
                regexp_replace(decorated,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                '555-[0-9]{4}', '<PHONE>', 'g'),
              '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
              '<IP>', 'g') AS redacted
          FROM dec
        )
        SELECT doc_id,
          CAST(len(regexp_extract_all(decorated,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_emails,
          CAST(len(regexp_extract_all(decorated,
            '555-[0-9]{4}')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(decorated,
            '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
            AS n_ips,
          md5(redacted) AS redacted_md5
        FROM red""")),

    // -------------------------------------- unigram-LM perplexity filter
    GraftQuery(
      "t11_perplexity_filter",
      (s, dir) => {
        import s.implicits._
        // CCNet-style LM quality filter: score each document by its
        // average negative log-likelihood under a unigram LM trained on
        // the corpus itself, keep the low-perplexity head. Cross-engine
        // determinism: p(w) = c/T is an identical double in both
        // engines; each word's -ln(p) is quantized to DECIMAL(12,6)
        // ONCE per VOCAB ENTRY (so a last-ulp ln() difference would
        // have to land exactly on a half-microunit boundary of one of
        // |vocab| values to matter), per-doc sums are exact decimal
        // arithmetic, and the final avg is one identical double
        // division. Scale: the LM is the word-count table — map-side
        // combinable aggregate, |vocab| rows, broadcast back; scoring
        // is one broadcast join + one per-doc aggregate. The NLL table
        // stays broadcastable to ~1e8-word vocabs; beyond that the join
        // runs as a shuffle on the uniform word key.
        // The query IS the facade call, so the oracle genuinely pins
        // TextOps.perplexityScore (not a parallel spelling of it).
        graft.operators.TextOps.perplexityScore(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text",
            cutoff = 3.402)
          .select($"id".as("doc_id"), $"n_words", $"avg_nll",
            when($"keep", 1).otherwise(0).as("keep"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents
        ),
        v AS (SELECT w, COUNT(*) c FROM w GROUP BY 1),
        t AS (SELECT CAST(SUM(c) AS BIGINT) t FROM v),
        nll AS (
          SELECT w, CAST(-ln(CAST(c AS DOUBLE) / (SELECT t FROM t))
            AS DECIMAL(12,6)) nll
          FROM v
        ),
        d AS (
          SELECT doc_id, COUNT(*) n_words, SUM(nll) s
          FROM w JOIN nll USING (w) GROUP BY 1
        )
        SELECT doc_id, n_words,
          CAST(s AS DOUBLE) / n_words AS avg_nll,
          CASE WHEN CAST(s AS DOUBLE) / n_words <= 3.402
            THEN 1 ELSE 0 END AS keep
        FROM d""")),

    // --------------------------------------- composite quality gate
    GraftQuery(
      "t12_quality_gate",
      (s, dir) => {
        import s.implicits._
        // The FINAL filter decision a corpus pipeline executes: one
        // keep/drop per document composing the library's established
        // signals — structural quality (t02's is_quality thresholds),
        // corpus-duplicate shingle share (t08's dup-ratio cut),
        // intra-document repetition (t09's Gopher cuts), and
        // unigram-LM perplexity (t11's CCNet cut). The query IS the
        // TextOps.qualityGate facade call, so the oracle pins the
        // composition users run. Each component is per-doc map/agg
        // work; the gate itself is three skinny per-id joins.
        graft.operators.TextOps.qualityGate(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text")
          .select($"id".as("doc_id"), $"is_quality", $"dup_keep",
            $"rep_keep", $"ppl_keep", $"keep")
      },
      Some(s"""
        WITH ws8 AS (
          SELECT doc_id, text, string_split(text, ' ') ws FROM documents
        ),
        q AS (
          SELECT doc_id,
            (length(text) >= 100 AND len(ws) >= 20
             AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.3)
              AS is_quality
          FROM ws8
        ),
        sh8 AS (
          SELECT doc_id, unnest(${Dedup.sqlShingles(8)}) sh FROM ws8
        ),
        df8 AS (SELECT sh, COUNT(*) df FROM sh8 GROUP BY 1),
        dup AS (
          SELECT s.doc_id,
            (CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*)) <= 0.5 AS dup_keep
          FROM sh8 s JOIN df8 d USING (sh) GROUP BY 1
        ),
        g3 AS (
          SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
            THEN [array_to_string(ws[i+1:i+3], ' ')
                  for i in range(len(ws) - 2)]
            ELSE [array_to_string(ws, ' ')] END) g
          FROM ws8
        ),
        rep AS (
          SELECT doc_id, MAX(c) topc, CAST(SUM(c) AS BIGINT) ng
          FROM (SELECT doc_id, g, COUNT(*) c FROM g3 GROUP BY 1, 2) t
          GROUP BY 1
        ),
        dw AS (
          SELECT doc_id, len(ws) - len(list_distinct(ws)) dupw,
            len(ws) nw
          FROM ws8
        ),
        repk AS (
          SELECT r.doc_id,
            (CAST(r.topc AS DOUBLE) / r.ng <= 1.0/32
             AND CAST(d.dupw AS DOUBLE) / d.nw <= 0.5) AS rep_keep
          FROM rep r JOIN dw d USING (doc_id)
        ),
        w AS (SELECT doc_id, unnest(ws) w FROM ws8),
        v AS (SELECT w, COUNT(*) c FROM w GROUP BY 1),
        t AS (SELECT CAST(SUM(c) AS BIGINT) t FROM v),
        nll AS (
          SELECT w, CAST(-ln(CAST(c AS DOUBLE) / (SELECT t FROM t))
            AS DECIMAL(12,6)) nll
          FROM v
        ),
        pd AS (
          SELECT doc_id, COUNT(*) n, SUM(nll) s
          FROM w JOIN nll USING (w) GROUP BY 1
        ),
        ppl AS (
          SELECT doc_id, (CAST(s AS DOUBLE) / n <= 3.402) ppl_keep
          FROM pd
        )
        SELECT q.doc_id, q.is_quality, dup.dup_keep, repk.rep_keep,
          ppl.ppl_keep,
          (q.is_quality AND dup.dup_keep AND repk.rep_keep
           AND ppl.ppl_keep) AS keep
        FROM q JOIN dup USING (doc_id) JOIN repk USING (doc_id)
          JOIN ppl USING (doc_id)""")),

    // --------------------------------------- TF-IDF keyword extraction
    GraftQuery(
      "t13_tfidf_topk",
      (s, dir) => {
        import s.implicits._
        // Top-3 terms per document by tf * ln(N/df). The query IS the
        // TextOps.tfidfTopTerms facade call; idf is decimal-quantized
        // once per vocab entry (the t11 trick) so tf x idf is an exact
        // product and the per-doc ranking is engine-identical.
        graft.operators.TextOps.tfidfTopTerms(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text", 3)
          .select($"id".as("doc_id"), $"term", $"tf", $"df",
            $"score", $"rank")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents)
          WHERE len(w) > 0
        ),
        tf AS (
          SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ),
        dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        idf AS (
          SELECT w, df,
            CAST(ln(CAST((SELECT n FROM n) AS DOUBLE) / df)
              AS DECIMAL(18,12)) AS idf
          FROM dfreq
        ),
        scored AS (
          SELECT tf.doc_id, tf.w AS term, tf.tf, idf.df,
            CAST(CAST(tf.tf AS DECIMAL(19,0)) * idf.idf AS DOUBLE) AS score
          FROM tf JOIN idf USING (w)
        )
        SELECT doc_id, term, tf, df, score, rank FROM (
          SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
          FROM scored) t
        WHERE rank <= 3""")),

    // ------------------------------------------- BPE tokenizer training
    GraftQuery(
      "t14_bpe_merges",
      (s, dir) => {
        import s.implicits._
        // learn 3 byte-pair-encoding merges from the corpus — the
        // tokenizer-training kernel. The query IS the TextOps.bpeLearn
        // facade call; the oracle unrolls the same 3 rounds as CTE
        // stages (count adjacent symbol pairs weighted by word freq,
        // argmax with pair-ascending ties, greedy left-to-right merge
        // via the wrapped-symbol literal replace).
        graft.operators.TextOps.bpeLearn(
          docs(s, dir).select($"text"), "text", merges = 3)
      },
      Some(bpeOracle(3))),

    GraftQuery(
      "t15_bpe_tokenize",
      (s, dir) => {
        import s.implicits._
        // apply the 3 learned merges back to the corpus: per-document
        // BPE token counts via one vocab join — the segmentation side
        // of the tokenizer (documents are never rewritten; only the
        // |vocab|-row word table carries the merged representations).
        graft.operators.TextOps.bpeSegment(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text",
            merges = 3)
          .select($"id".as("doc_id"), $"n_words", $"n_bpe_tokens")
      },
      Some(bpeSegmentOracle(3))),

    // ---------------------------------- interpolated bigram perplexity
    GraftQuery(
      "t16_bigram_perplexity",
      (s, dir) => {
        import s.implicits._
        // the n-gram upgrade of t11: interpolated bigram LM, NLLs
        // decimal-quantized once per (bigram | vocab) entry. The query
        // IS the TextOps.bigramPerplexityScore facade call.
        graft.operators.TextOps.bigramPerplexityScore(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text")
          .select($"id".as("doc_id"), $"n_words", $"avg_nll", $"keep")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') ws FROM documents
          WHERE len(string_split(text, ' ')) > 0
        ),
        w AS (SELECT doc_id, unnest(ws) w FROM toks),
        uni AS (SELECT w, COUNT(*) c FROM w GROUP BY 1),
        t AS (SELECT CAST(SUM(c) AS BIGINT) t FROM uni),
        bgs AS (
          SELECT doc_id,
            unnest([ws[i+1] || ' ' || ws[i+2]
                    for i in range(len(ws) - 1)]) bg
          FROM toks
        ),
        bi AS (SELECT bg, COUNT(*) cab FROM bgs GROUP BY 1),
        ctx AS (
          SELECT string_split(bg, ' ')[1] w, CAST(SUM(cab) AS BIGINT) c1
          FROM bi GROUP BY 1
        ),
        binll AS (
          SELECT b.bg,
            CAST(-ln(0.7 * (CAST(b.cab AS DOUBLE) / x.c1)
              + (1.0 - 0.7) * (CAST(u.c AS DOUBLE) / (SELECT t FROM t)))
              AS DECIMAL(12,6)) nll
          FROM bi b
            JOIN ctx x ON x.w = string_split(b.bg, ' ')[1]
            JOIN uni u ON u.w = string_split(b.bg, ' ')[2]
        ),
        uninll AS (
          SELECT w, CAST(-ln(CAST(c AS DOUBLE) / (SELECT t FROM t))
            AS DECIMAL(12,6)) nll
          FROM uni
        ),
        bs AS (
          SELECT g.doc_id, COUNT(*) nb, SUM(n.nll) sb
          FROM bgs g JOIN binll n USING (bg) GROUP BY 1
        ),
        fs AS (
          SELECT tk.doc_id, n.nll s1
          FROM (SELECT doc_id, ws[1] w FROM toks) tk
          JOIN uninll n USING (w)
        )
        SELECT f.doc_id,
          CAST(COALESCE(b.nb, 0) + 1 AS BIGINT) AS n_words,
          CAST(f.s1 + COALESCE(b.sb, 0) AS DOUBLE)
            / (COALESCE(b.nb, 0) + 1) AS avg_nll,
          (CAST(f.s1 + COALESCE(b.sb, 0) AS DOUBLE)
            / (COALESCE(b.nb, 0) + 1)) <= 3.402 AS keep
        FROM fs f LEFT JOIN bs b USING (doc_id)""")),

    // ------------------------------------------ lexical diversity (t17)
    GraftQuery(
      "t17_lexical_diversity",
      (s, dir) => {
        import s.implicits._
        // Vocabulary-collapse quality signals: type-token ratio and
        // hapax richness per document (templated/degenerate text is
        // TTR-low and hapax-poor; natural prose is hapax-rich). Exact
        // integer counts until the two final double divisions; one
        // id-keyed shuffle, map-side combined, no joins. The query IS
        // the TextOps.lexicalDiversity facade call.
        graft.operators.TextOps.lexicalDiversity(
            docs(s, dir).select($"doc_id", $"text"), "doc_id", "text")
          .select($"id".as("doc_id"), $"n_tokens", $"n_types", $"ttr",
            $"n_hapax", $"hapax_ratio")
      },
      Some("""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents
        ),
        c AS (
          SELECT doc_id, w, COUNT(*) AS c FROM w
          WHERE len(w) > 0 GROUP BY 1, 2
        )
        SELECT doc_id,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_types,
          CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS ttr,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hapax,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS hapax_ratio
        FROM c GROUP BY doc_id""")),

    // ----------------------------- merge-apply BPE tokenization (t18)
    GraftQuery(
      "t18_bpe_encode",
      (s, dir) => {
        import s.implicits._
        // TRUE merge-apply segmentation: broadcast the learned merge
        // RANKS and tokenize every word per-partition with the trainer's
        // own greedy fold — the spelling that handles out-of-vocabulary
        // words (t15's vocab join silently drops them; see the
        // bpeEncode scaladoc). On an in-vocab corpus (here: scored
        // corpus == train corpus) the two spellings are provably
        // equal, so the oracle is t15's cached-segmentation SQL — the
        // hash gate IS the equivalence proof; the OOV side is pinned
        // by BpePropertySpec's train ∪ unseen sweeps.
        val d = docs(s, dir).select($"doc_id", $"text")
        val mergeTable = graft.operators.TextOps.bpeLearn(
          d.select($"text"), "text", merges = 3)
        graft.operators.TextOps.bpeEncode(d, "doc_id", "text", mergeTable)
          .select($"id".as("doc_id"), $"n_words", $"n_bpe_tokens")
      },
      Some(bpeEncodeOracle(3))),

    // ------------------------------- BPE token SEQUENCES (t19)
    GraftQuery(
      "t19_bpe_tokenize",
      (s, dir) => {
        import s.implicits._
        // the trainer handoff t18 deliberately omits: one row per
        // emitted TOKEN, (word_idx, tok_idx) ordering the document's
        // full token stream. In-vocab corpus (train corpus == encode
        // corpus), so the oracle is the trained segmentation s4
        // unrolled per word position — the hash gate proves the
        // merge-apply fold emits exactly the trained token SEQUENCE in
        // order, not merely the right counts (the OOV side is pinned
        // by BpePropertySpec's replay sweeps).
        val d = docs(s, dir).select($"doc_id", $"text")
        val mergeTable = graft.operators.TextOps.bpeLearn(
          d.select($"text"), "text", merges = 3)
        graft.operators.TextOps.bpeTokenize(d, "doc_id", "text",
            mergeTable)
          .select($"id".as("doc_id"),
            $"word_idx".cast("long").as("word_idx"),
            $"tok_idx".cast("long").as("tok_idx"), $"token")
      },
      Some(bpeTokenizeOracle(3))),

    // ------------------------------- BPE token IDS (t20)
    GraftQuery(
      "t20_bpe_token_ids",
      (s, dir) => {
        import s.implicits._
        // t19 resolved to dense vocabulary ids: the id table is the
        // base code-point inventory of the training corpus plus every
        // merged symbol, 0-based by token order (deterministic — both
        // engines order the same UTF-8 strings), joined broadcast onto
        // the token stream. In-vocab corpus, so no NULL ids here; the
        // NULL-on-unseen contract is pinned by BpePropertySpec.
        val d = docs(s, dir).select($"doc_id", $"text")
        val mergeTable = graft.operators.TextOps.bpeLearn(
          d.select($"text"), "text", merges = 3)
        val ids = graft.operators.TextOps.bpeTokenIdTable(
          d, "text", mergeTable)
        graft.operators.TextOps.bpeTokenIds(d, "doc_id", "text",
            mergeTable, ids)
          .select($"id".as("doc_id"),
            $"word_idx".cast("long").as("word_idx"),
            $"tok_idx".cast("long").as("tok_idx"), $"token", $"token_id")
      },
      Some(bpeTokenIdsOracle(3)))
  )

  /** DuckDB spelling of [[graft.operators.TextOps.bpeEncode]] on an
    * in-vocab corpus: t15's cached-segmentation lookup, but ROW-COMPLETE
    * — a LEFT JOIN from documents, so a zero-word (or hypothetically
    * all-OOV) document appears with counts 0 exactly as bpeEncode
    * emits it. t15's inner-join spelling deliberately mirrors the
    * vocab join's row-dropping; bpeEncode's contract is the opposite
    * (nothing is ever dropped), and its oracle must pin that too. */
  private def bpeEncodeOracle(merges: Int): String =
    s"""${bpeStages(merges)},
        ntok AS (
          SELECT w, CAST(len(string_split(trim(sp), '  ')) AS BIGINT)
            AS ntok
          FROM s${merges + 1}
        ),
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents
        ),
        cnt AS (
          SELECT doc_id, COUNT(*) AS n_words,
            CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens
          FROM tok JOIN ntok USING (w)
          GROUP BY 1
        )
        SELECT d.doc_id,
          CAST(COALESCE(c.n_words, 0) AS BIGINT) AS n_words,
          CAST(COALESCE(c.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN cnt c USING (doc_id)"""

  /** The shared CTE prefix of the BPE oracles, unrolled to `merges`
    * stages. Stage i: pairs from the wrapped-symbol representation
    * (split on the DOUBLE space), weighted argmax m_i, then the same
    * boundary-safe literal replace into s_{i+1}. Ends with
    * s_{merges+1} = the fully merged representation (w, sp, freq). */
  private def bpeStages(merges: Int): String =
    s"""
        WITH ${bpeStageCtes(merges)}"""

  /** [[bpeStages]] WITHOUT the WITH keyword — the CTE bodies alone, so
    * another oracle (PipelineExtra's p18/p19 corpus-build-with-BPE
    * chain) can splice them into its own CTE list. Names (w0, s_i,
    * p_i, m_i) are disjoint from the corpus-build chain's. */
  private[queries] def bpeStageCtes(merges: Int): String = {
    val stages = (1 to merges).map { i =>
      s"""
        p$i AS (
          SELECT unnest([sym[i+1] || ' ' || sym[i+2]
                         for i in range(len(sym) - 1)]) AS pr, freq
          FROM (SELECT string_split(trim(sp), '  ') AS sym, freq FROM s$i)
        ),
        m$i AS (
          SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM p$i
          GROUP BY 1 ORDER BY cnt DESC, pr ASC LIMIT 1
        ),
        s${i + 1} AS (
          -- a round with no pairs left (degenerate corpus) leaves the
          -- representation unchanged, like the engine's skipped round;
          -- without the guard the NULL pattern would NULL every sp
          SELECT w, CASE WHEN (SELECT COUNT(*) FROM m$i) = 0 THEN sp
            ELSE replace(sp,
              ' ' || string_split((SELECT pr FROM m$i), ' ')[1] || '  ' ||
                     string_split((SELECT pr FROM m$i), ' ')[2] || ' ',
              ' ' || replace((SELECT pr FROM m$i), ' ', '') || ' ')
            END AS sp,
            freq
          FROM s$i)"""
    }.mkString(",")
    s"""w0 AS (
          SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE len(w) > 0 GROUP BY 1
        ),
        s1 AS (
          SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS sp, freq
          FROM w0
        ),$stages"""
  }

  /** DuckDB spelling of [[graft.operators.TextOps.bpeLearn]]. */
  private def bpeOracle(merges: Int): String = {
    val rows = (1 to merges).map { i =>
      s"""SELECT CAST($i AS INT) AS step, pr AS pair,
            replace(pr, ' ', '') AS merged, cnt FROM m$i"""
    }.mkString("\n        UNION ALL ")
    s"""${bpeStages(merges)}
        $rows"""
  }

  /** [[bpeStageCtes]] plus the per-word token-count CTE (`ntok`) — the
    * composable unit PipelineExtra's BPE corpus-build oracles splice
    * after their own chain. */
  private[queries] def bpeNtokCtes(merges: Int): String =
    s"""${bpeStageCtes(merges)},
        ntok AS (
          SELECT w, CAST(len(string_split(trim(sp), '  ')) AS BIGINT)
            AS ntok
          FROM s${merges + 1}
        )"""

  /** Shared token-STREAM CTEs of the t19/t20 oracles: each word
    * position zip-unnested with its index, joined to the trained
    * segmentation, the token list zip-unnested with its index — the
    * (doc_id, word_idx, tok_idx, token) stream bpeTokenize emits.
    * Zero-word documents emit no rows, exactly as the operator. */
  private def bpeTokenStreamCtes(merges: Int): String =
    s"""toks AS (
          SELECT w, string_split(trim(sp), '  ') AS tl
          FROM s${merges + 1}
        ),
        wpos AS (
          SELECT doc_id, unnest(ws) AS w,
            unnest([CAST(i AS BIGINT) for i in range(len(ws))])
              AS word_idx
          FROM (
            SELECT doc_id,
              list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
            FROM documents)
        ),
        tstream AS (
          SELECT doc_id, word_idx,
            unnest([CAST(j AS BIGINT) for j in range(len(tl))])
              AS tok_idx,
            unnest(tl) AS token
          FROM wpos JOIN toks USING (w)
        )"""

  /** DuckDB spelling of [[graft.operators.TextOps.bpeTokenize]] on an
    * in-vocab corpus. */
  private def bpeTokenizeOracle(merges: Int): String =
    s"""${bpeStages(merges)},
        ${bpeTokenStreamCtes(merges)}
        SELECT doc_id, word_idx, tok_idx, token FROM tstream"""

  /** The t20 vocab CTEs (base code-point inventory of the training
    * corpus plus every merged symbol, 0-based dense ids by token
    * order) — shared by [[bpeTokenIdsOracle]] and the composable
    * [[bpeTokenIdStreamCtes]] block. */
  private def bpeVocabCtes(merges: Int): String = {
    val mergedRows = (1 to merges).map(i =>
      s"SELECT replace(pr, ' ', '') AS token FROM m$i")
      .mkString("\n            UNION ALL ")
    s"""vocabt AS (
          SELECT DISTINCT token FROM (
            SELECT unnest(string_split(trim(
                regexp_replace(w, '(.)', ' \\1 ', 'g')), '  ')) AS token
            FROM w0
            UNION ALL $mergedRows)
        ),
        vocab AS (
          SELECT token,
            CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
              AS token_id
          FROM vocabt
        )"""
  }

  /** The full token-ID stream as a composable CTE block WITHOUT the
    * WITH keyword — the trained stages + the t19 stream + the t20
    * vocab join, ending in `idstream(doc_id, word_idx, tok_idx,
    * token_id)` — so PipelineExtra's p20 packed-sequence oracle can
    * window the t20 stream by its own pack-boundary chain. */
  private[queries] def bpeTokenIdStreamCtes(merges: Int): String =
    s"""${bpeStageCtes(merges)},
        ${bpeTokenStreamCtes(merges)},
        ${bpeVocabCtes(merges)},
        idstream AS (
          SELECT t.doc_id, t.word_idx, t.tok_idx, v.token_id
          FROM tstream t LEFT JOIN vocab v USING (token)
        )"""

  /** DuckDB spelling of [[graft.operators.TextOps.bpeTokenIds]]: the
    * t19 stream LEFT-joined to the dense id table (base code-point
    * inventory of the training corpus plus every merged symbol,
    * 0-based by token order). */
  private def bpeTokenIdsOracle(merges: Int): String =
    s"""${bpeStages(merges)},
        ${bpeTokenStreamCtes(merges)},
        ${bpeVocabCtes(merges)}
        SELECT t.doc_id, t.word_idx, t.tok_idx, t.token, v.token_id
        FROM tstream t LEFT JOIN vocab v USING (token)"""

  /** DuckDB spelling of [[graft.operators.TextOps.bpeSegment]]. */
  private def bpeSegmentOracle(merges: Int): String =
    s"""${bpeStages(merges)},
        ntok AS (
          SELECT w, CAST(len(string_split(trim(sp), '  ')) AS BIGINT)
            AS ntok
          FROM s${merges + 1}
        ),
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents
        )
        SELECT doc_id, COUNT(*) AS n_words,
          CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens
        FROM tok JOIN ntok USING (w)
        GROUP BY 1"""
}
