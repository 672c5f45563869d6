package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Ckpt.LoopCheckpoint

/** Training-data pipeline operators over `documents` (SURVEY §2 T9 mandate:
  * "the operations a large-scale training-data pipeline would need") —
  * round-3 continuation wave: the dataset-management ops that sit AROUND the
  * dedup/quality ladder already in [[TextOps]]:
  *
  *  - deterministic hash split (train/validation/test assignment);
  *  - benchmark-contamination scan (n-gram overlap vs an eval set);
  *  - contiguous sequence packing (token-budget binning per shard);
  *  - dataset-card rollup (per source × lang stats incl. duplicate rate).
  *
  * All four are expressed as portable SQL run through `spark.sql` with a
  * DuckDB oracle twin, engine differences confined to spelled-out casts and
  * list-function names.
  *
  * Portability note on hashing: there is no common integer hash between
  * Spark and DuckDB, so anything "randomized but reproducible" is built on
  * `md5` hex (identical in both) and the hex digits are int-ified with
  * `instr('0123456789abcdef', digit) - 1` arithmetic — both engines have
  * `instr` with the same (haystack, needle) argument order. The same
  * md5-keyed discipline as q_sample_stratified / q_sample_bernoulli.
  */
object PipelineOps {

  /** First 4 hex digits of md5(doc_id) as an INT in [0, 65535] — the
    * portable split key. `cast` is the engine's string-type name. */
  private def md5Hex4(cast: String): String = {
    val h = s"md5(CAST(doc_id AS $cast))"
    (0 until 4).map { i =>
      val mult = 1 << (4 * (3 - i))
      s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")
  }

  /** Shared SQL skeleton for the hash split: bucket in [0,1000) from the
    * md5 key; 80/10/10 → train/validation/test. The assignment is a pure
    * function of doc_id: narrow (no shuffle), reproducible across engines,
    * partitionings and reruns, and stable under corpus growth (a doc's
    * split never changes when other docs are added — the property that
    * keeps eval sets uncontaminated across dataset versions). The only
    * shuffle is the final tiny (split × lang) rollup. */
  private[graft] def splitSql(cast: String): String =
    s"""WITH b AS (SELECT lang, n_chars, (${md5Hex4(cast)}) % 1000 AS bucket
       |           FROM documents)
       |SELECT CASE WHEN bucket < 800 THEN 'train'
       |            WHEN bucket < 900 THEN 'validation'
       |            ELSE 'test' END AS split,
       |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM b
       |GROUP BY 1, lang
       |ORDER BY split, lang""".stripMargin

  /** Contamination scan: word 3-grams here play the role the usual 8–13
    * grams play on real text (the corpus vocabulary is ~20 tokens, so
    * 3-grams already give a realistic collision rate; the shape is
    * n-size-agnostic). Benchmark set = docs with doc_id % 50 = 0.
    *
    * Scale shape: the per-doc distinct-gram fan-out is the big relation;
    * the benchmark gram set is tiny by construction (eval sets are) and
    * broadcasts, so the overlap join never shuffles the corpus side. The
    * per-doc hit count is a map-side-combinable hash aggregate. At 100 TB
    * you'd hash the grams (metric unchanged) to shrink the join key — kept
    * as raw strings here so the oracle stays cast-free. */
  /** The per-doc distinct-gram fan-out — referenced three times downstream
    * (probe side, benchmark side, per-doc totals), so the Spark entry
    * materializes it ONCE via localCheckpoint (the q_dedup_near_wide
    * lesson: Spark inlines multi-referenced CTEs and would explode the
    * corpus three times). The checkpoint trades one materialized
    * (doc_id, gram) pass for two recomputes — at 100 TB that is also the
    * natural persistence boundary (the gram table is what you'd write out
    * and reuse across many eval sets anyway). */
  private[graft] val contaminationGramSparkSql =
    """SELECT doc_id, gram
      |FROM (SELECT doc_id, split(text, ' ') AS t FROM documents
      |      WHERE size(split(text, ' ')) >= 3) d
      |LATERAL VIEW explode(array_distinct(transform(
      |  sequence(1, size(t) - 2),
      |  i -> concat_ws(' ', slice(t, i, 3))))) gx AS gram""".stripMargin

  private[graft] val contaminationRestSparkSql =
    """WITH bg AS (SELECT gram, doc_id FROM g WHERE doc_id % 50 = 0),
      |hits AS (SELECT c.doc_id, count(DISTINCT c.gram) AS n_hit
      |         FROM g c JOIN bg ON c.gram = bg.gram AND bg.doc_id <> c.doc_id
      |         GROUP BY c.doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
      |SELECT t.doc_id, t.n_grams, h.n_hit,
      |       round(h.n_hit / t.n_grams, 6) AS score
      |FROM tot t JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  private val contaminationDuckSql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |        generate_series(1, CAST(len(t) AS INT) - 2),
      |        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS gram
      |      FROM d),
      |bg AS (SELECT gram, doc_id FROM g WHERE doc_id % 50 = 0),
      |hits AS (SELECT c.doc_id, count(DISTINCT c.gram) AS n_hit
      |         FROM g c JOIN bg ON c.gram = bg.gram AND bg.doc_id <> c.doc_id
      |         GROUP BY c.doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
      |SELECT t.doc_id, t.n_grams, h.n_hit,
      |       round(h.n_hit / t.n_grams, 6) AS score
      |FROM tot t JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Contiguous sequence packing: walk each source shard in doc_id order,
    * close a 512-token bin whenever the running total crosses the budget
    * (bin id = tokens-before-this-doc div 512 — documents are never split,
    * so a bin can overflow by at most one document; that bounded overflow
    * is the standard price of document-boundary packing).
    *
    * Scale shape: the running sum is windowed PARTITION BY source — each
    * shard packs independently and in parallel, which is how packing is
    * actually run (per input shard), instead of a single global ordered
    * window that would serialize 100 TB through one task. */
  private def packSql(nTok: String, intDiv: String): String =
    s"""WITH d AS (SELECT source, doc_id, $nTok AS n_tok
       |           FROM documents),
       |c AS (SELECT source, doc_id, n_tok,
       |        coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |      FROM d)
       |SELECT source, CAST(cum_before $intDiv 512 AS BIGINT) AS bin,
       |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c
       |GROUP BY source, 2
       |ORDER BY source, bin""".stripMargin

  private[graft] val packSparkSql =
    packSql("CAST(size(split(text, ' ')) AS BIGINT)", "div")
  private val packDuckSql =
    packSql("CAST(len(string_split(text, ' ')) AS BIGINT)", "//")

  /** Dataset-card rollup: doc/token/char volumes and exact duplicate rate
    * (1 − distinct normalized texts / docs) at (source × lang), per-source
    * and global grains in ONE pass via GROUPING SETS — the summary table a
    * dataset release ships. The normalized-key distinct under grouping
    * sets is the expensive part (Spark expands to one repartition per
    * grain); volumes are plain map-side-combinable sums. NULL grouping
    * slots are coalesced to 'ALL' so the ORDER BY never depends on the
    * engines' (different) default NULL placement. */
  private def cardSql(splitLen: String, norm: String): String =
    s"""WITH d AS (SELECT source, lang, n_chars, $splitLen AS n_tok,
       |             $norm AS norm
       |           FROM documents)
       |SELECT coalesce(source, 'ALL') AS src, coalesce(lang, 'ALL') AS lng,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       round(avg(n_chars), 2) AS avg_chars,
       |       count(DISTINCT norm) AS n_uniq,
       |       round(1.0 - count(DISTINCT norm) / count(*), 6) AS dup_rate
       |FROM d
       |GROUP BY GROUPING SETS ((source, lang), (source), ())
       |ORDER BY src, lng""".stripMargin

  private val cardSparkSql = cardSql(
    "CAST(size(split(text, ' ')) AS BIGINT)",
    "array_join(sort_array(split(text, ' ')), ' ')")
  private val cardDuckSql = cardSql(
    "CAST(len(string_split(text, ' ')) AS BIGINT)",
    "array_to_string(list_sort(string_split(text, ' ')), ' ')")

  /** Unigram log-probability quality score (the perplexity-filter proxy:
    * score each doc by the average log corpus-frequency of its tokens —
    * low scorers are gibberish / out-of-domain, the CCNet-style quality
    * gate). The unigram "model" is the corpus itself: freq(tok)/N.
    *
    * Determinism: each per-token ln term is quantized to DECIMAL(30,6)
    * before the exact decimal sum (the [[graft.Det]] discipline — a plain
    * double sum would be partial-aggregation-order dependent), and the
    * perplexity exponentiates the ROUNDED average so both engines feed
    * `exp` the identical double.
    *
    * Scale shape: the frequency table is vocabulary-sized (tiny next to
    * the corpus even for a real 100k-token vocab) → broadcast join; the
    * per-doc aggregate is map-side combinable. The token explode feeds two
    * consumers (freq build + scoring join), so the Spark entry
    * materializes it once via localCheckpoint, same as the contamination
    * gram stage. */
  private val logprobTokSparkSql =
    """SELECT doc_id, t AS tok FROM documents
      |LATERAL VIEW explode(split(text, ' ')) x AS t""".stripMargin

  // Output rounding is spelled as floor(x * 10^k + 0.5) / 10^k — a pure
  // IEEE double-op pipeline both engines evaluate identically — instead
  // of round(double, k), whose implementations differ at k-th-decimal .5
  // boundaries (Spark rounds the shortest decimal string, DuckDB the
  // binary double; diverged on ~10 docs at sf1 — the sf1-gate find).
  // slp/n lands on such boundaries often because slp is an exact
  // 6-decimal quantity divided by a small integer.
  private def logprobRestSql(tokRef: String): String =
    s"""WITH freq AS (SELECT tok, count(*) AS c FROM $tokRef GROUP BY tok),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM $tokRef),
       |sc AS (SELECT doc_id, count(*) AS n_tok,
       |         CAST(sum(CAST(ln(c / n) AS DECIMAL(30,6))) AS DOUBLE) AS slp
       |       FROM $tokRef tk JOIN freq USING (tok) CROSS JOIN tot
       |       GROUP BY doc_id)
       |SELECT doc_id, n_tok,
       |       floor(slp / n_tok * 1e6 + 0.5) / 1e6 AS avg_logprob,
       |       floor(exp(-(floor(slp / n_tok * 1e6 + 0.5) / 1e6))
       |             * 1e4 + 0.5) / 1e4 AS ppl
       |FROM sc ORDER BY doc_id""".stripMargin

  private val logprobDuckSql = {
    val tok =
      """(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)"""
    logprobRestSql(tok)
  }

  /** Bigram LM scoring with add-k smoothing (k = 0.5) — the next rung
    * above [[logprobRestSql]]'s unigram CCNet filter: P(w2|w1) =
    * (c12 + k) / (c1 + k·V) where c1 counts bigram PREFIXES (so the
    * conditional normalizes exactly) and V is the distinct-prefix count.
    * Per-bigram ln is quantized to DECIMAL(30,6) before the per-doc sum,
    * so engines agree bit-for-bit in any partial order (the unigram
    * query's determinism discipline). The bigram relation is referenced
    * three times (pair stats, prefix stats, scoring join) — the Spark
    * side materializes it once; stats tables are vocabulary²-bounded
    * reduced state and join back on the bigram key (co-partitionable at
    * 100 TB). Docs with < 2 tokens have no bigrams and drop out — same
    * rows in both engines. */
  private def bigramRestSql(bgRef: String): String =
    s"""WITH bstats AS (SELECT bg, count(*) AS c12 FROM $bgRef b GROUP BY bg),
       |ustats AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
       |           FROM $bgRef b GROUP BY split_part(bg, ' ', 1)),
       |vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM ustats),
       |sc AS (SELECT doc_id, count(*) AS n_bg,
       |         CAST(sum(CAST(ln((c12 + 0.5) / (c1 + 0.5 * v)) AS DECIMAL(30,6))) AS DOUBLE) AS slp
       |       FROM $bgRef b JOIN bstats USING (bg)
       |       JOIN ustats ON split_part(b.bg, ' ', 1) = ustats.w1
       |       CROSS JOIN vv
       |       GROUP BY doc_id)
       |SELECT doc_id, n_bg,
       |       floor(slp / n_bg * 1e6 + 0.5) / 1e6 AS avg_logprob,
       |       floor(exp(-(floor(slp / n_bg * 1e6 + 0.5) / 1e6))
       |             * 1e4 + 0.5) / 1e4 AS ppl
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney bigram LM (fixed discount D = 0.75) — the
    * smoothing every real n-gram LM ships instead of add-k:
    *   P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T
    * where N1+(w1·) / N1+(·w2) are distinct-successor / predecessor type
    * counts and T the total distinct bigram types — the continuation
    * distribution that makes KN fix add-k's over-smoothing of frequent-
    * but-unproductive prefixes. All stats derive from ONE grouped pass
    * over the bigram-type relation (c1 = Σc12, N1+ = count(*) per side —
    * vocabulary-bounded reduced state, co-partitionable on the bigram key
    * at 100 TB). Trained on the full corpus, so every scored bigram has
    * c12 ≥ 1 and c12 − D ≥ 0.25 > 0 — no zero-probability path exists by
    * construction. The probability expression is written in ONE shared
    * double spelling (exponent literal 0.75e0 — a bare 0.75 parses as
    * DECIMAL in Spark and would flip the arithmetic type), per-bigram ln
    * quantized to DECIMAL(30,6) pre-sum (the unigram determinism
    * discipline), per-doc readout identical to [[bigramRestSql]]. */
  private def knRestSql(bgRef: String): String =
    s"""WITH bstats AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12
       |               FROM $bgRef b GROUP BY bg),
       |ustats AS (SELECT split_part(bg, ' ', 1) AS w1,
       |             CAST(sum(c12) AS BIGINT) AS c1,
       |             CAST(count(*) AS BIGINT) AS n1p
       |           FROM bstats GROUP BY split_part(bg, ' ', 1)),
       |cstats AS (SELECT split_part(bg, ' ', 2) AS w2,
       |             CAST(count(*) AS BIGINT) AS t2
       |           FROM bstats GROUP BY split_part(bg, ' ', 2)),
       |tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bstats),
       |sc AS (SELECT doc_id, count(*) AS n_bg,
       |         CAST(sum(CAST(ln(
       |             (CAST(c12 AS DOUBLE) - 0.75e0) / c1
       |             + (0.75e0 * n1p / c1) * (CAST(t2 AS DOUBLE) / t)
       |           ) AS DECIMAL(30,6))) AS DOUBLE) AS slp
       |       FROM $bgRef b JOIN bstats USING (bg)
       |       JOIN ustats ON split_part(b.bg, ' ', 1) = ustats.w1
       |       JOIN cstats ON split_part(b.bg, ' ', 2) = cstats.w2
       |       CROSS JOIN tt
       |       GROUP BY doc_id)
       |SELECT doc_id, n_bg,
       |       floor(slp / n_bg * 1e6 + 0.5) / 1e6 AS avg_logprob,
       |       floor(exp(-(floor(slp / n_bg * 1e6 + 0.5) / 1e6))
       |             * 1e4 + 0.5) / 1e4 AS ppl
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Epoch-reshuffle SQL shared across engines (`epochs` = 3-row
    * generator subquery, `cast` = string-type name). */
  private def epochShuffleSql(epochs: String, cast: String): String =
    s"""WITH e AS ($epochs),
       |k AS (SELECT epoch, doc_id,
       |        md5(concat(CAST(epoch AS $cast), ':', CAST(doc_id AS $cast))) AS ord
       |      FROM documents CROSS JOIN e),
       |r AS (SELECT epoch, doc_id,
       |        row_number() OVER (PARTITION BY epoch ORDER BY ord, doc_id) AS rk
       |      FROM k)
       |SELECT epoch, rk, doc_id FROM r WHERE rk <= 5
       |ORDER BY epoch, rk""".stripMargin

  private val bigramTokSparkSql: String =
    """SELECT doc_id,
      |  explode(zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),
      |                   (x, y) -> concat(x, ' ', y))) AS bg
      |FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)""".stripMargin

  private val bigramLogprobDuckSql: String = bigramRestSql(
    """(SELECT doc_id,
      |   unnest(list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
      |                         z -> concat(z[1], ' ', z[2]))) AS bg
      | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin)

  /** Temperature-scaled language mixing (the multilingual sampling rule:
    * resampling weights ∝ share^α / share with α = 0.3, so low-resource
    * languages are up-sampled without letting them dominate). Emits per
    * language the observed token share, the α-temperature target share,
    * and the resulting sampling weight. Intermediate `pow` values are
    * quantized to DECIMAL(30,8) and the normalizer is an exact decimal sum
    * (5-row double sums are still partial-order-dependent), then all
    * divisions happen in double (decimal÷decimal scale rules differ across
    * engines — SURVEY §2.3). One tiny aggregate over a lang-grouped scan:
    * the 100 TB side never does more than one map-side-combinable pass. */
  private def mixSql(nTok: String): String =
    s"""WITH s AS (SELECT lang, count(*) AS n_docs,
       |             CAST(sum($nTok) AS BIGINT) AS n_tokens
       |           FROM documents GROUP BY lang),
       |t AS (SELECT CAST(sum(CAST(n_tokens AS DECIMAL(30,0))) AS DOUBLE) AS total
       |      FROM s),
       |p AS (SELECT lang, n_docs, n_tokens, n_tokens / total AS share,
       |        CAST(CAST(pow(n_tokens / total, 0.3) AS DECIMAL(30,8)) AS DOUBLE) AS pa
       |      FROM s CROSS JOIN t),
       |q AS (SELECT CAST(sum(CAST(pa AS DECIMAL(30,8))) AS DOUBLE) AS z FROM p)
       |SELECT lang, n_docs, n_tokens,
       |       round(share, 6) AS actual_share,
       |       round(pa / z, 6) AS target_share,
       |       round((pa / z) / share, 6) AS weight
       |FROM p CROSS JOIN q
       |ORDER BY lang""".stripMargin

  private val mixSparkSql = mixSql("CAST(size(split(text, ' ')) AS BIGINT)")
  private val mixDuckSql = mixSql("CAST(len(string_split(text, ' ')) AS BIGINT)")

  /** Curriculum bucketing: docs land in ten FIXED-WIDTH quality buckets
    * (the q_text_quality composite score is already in [0,1], so bucket =
    * floor(score·10) — no global ntile sort, the construction a 100 TB
    * corpus needs: bucket assignment is a pure per-row function and the
    * output is 10 rows however big the corpus), then each bucket gets a
    * curriculum sampling weight ∝ (b+1)² over the nonempty buckets —
    * quality-skewed sampling for early training. Weights derive from
    * integer bucket indices and counts only, so the whole report is
    * bit-stable; per-bucket token sums are exact decimal. `tokExpr` is
    * the engine's token-count spelling; `lenFn` its token-array length. */
  private def curriculumSql(lenFn: String, distinctFn: String, filterFn: String,
                            tokSplit: String): String =
    s"""WITH d AS (SELECT doc_id, $tokSplit AS toks FROM documents),
       |q AS (SELECT doc_id, $lenFn(toks) AS n_tok,
       |        CAST(0.4 AS DOUBLE) * ($lenFn($distinctFn(toks)) / $lenFn(toks))
       |          + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE)
       |              - $lenFn($filterFn) / $lenFn(toks))
       |          + CAST(0.3 AS DOUBLE) * least(CAST(1 AS DOUBLE), $lenFn(toks) / CAST(100 AS DOUBLE)) AS score
       |      FROM d),
       |b AS (SELECT doc_id, n_tok, score,
       |        CAST(least(floor(score * 10), 9) AS BIGINT) AS bucket
       |      FROM q),
       |g AS (SELECT bucket, count(*) AS n_docs,
       |        CAST(sum(CAST(n_tok AS DECIMAL(30,0))) AS BIGINT) AS n_tokens,
       |        round(CAST(sum(CAST(score AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS mean_score
       |      FROM b GROUP BY bucket),
       |w AS (SELECT CAST(sum((bucket + 1) * (bucket + 1)) AS DOUBLE) AS z FROM g)
       |SELECT g.bucket, g.n_docs, g.n_tokens, g.mean_score,
       |  round((g.bucket + 1) * (g.bucket + 1) / w.z, 6) AS sample_weight
       |FROM g CROSS JOIN w
       |ORDER BY g.bucket""".stripMargin

  private val curriculumSparkSql = curriculumSql(
    "size", "array_distinct", "filter(toks, t -> t IN ('the', 'a'))",
    "split(text, ' ')")
  private val curriculumDuckSql = curriculumSql(
    "len", "list_distinct", "list_filter(toks, t -> t IN ('the', 'a'))",
    "string_split(text, ' ')")

  /** Deterministic source-interleaved training order: docs are md5-
    * shuffled WITHIN each source, then sources are round-robin-interleaved
    * by taking rank-1 of every source, then rank-2, … — the standard
    * "shuffle shards, interleave sources" ordering that keeps any window
    * of the training stream source-balanced. Fully reproducible (md5
    * discipline), and at scale the total order is materialized per output
    * shard via range partitioning on (rank, source), never through one
    * task. Emits the first 100 positions as the checkable prefix — and
    * the global-position window only ever sees rows that can REACH those
    * positions: `rk <= 100` is exact (a row with per-source rank R > 100
    * already has its own source's ranks 1..R−1 ≥ 100 rows ahead of it in
    * (rk, source) order, so its pos > 100), shrinking the unpartitioned
    * window's input from corpus-sized to ≤ limit × n_sources rows. The
    * per-source rank window above it stays fully distributed. */
  private def interleaveSql(cast: String): String =
    s"""WITH r AS (SELECT doc_id, source,
       |             row_number() OVER (PARTITION BY source
       |               ORDER BY md5(CAST(doc_id AS $cast)), doc_id) AS rk
       |           FROM documents)
       |SELECT row_number() OVER (ORDER BY rk, source) AS pos,
       |       doc_id, source, rk
       |FROM r
       |WHERE rk <= 100
       |ORDER BY pos
       |LIMIT 100""".stripMargin

  /** CCNet-style perplexity bucketing: score each doc with the corpus
    * unigram LM ([[logprobRestSql]]'s exact-decimal discipline: per-token
    * ln quantized to DECIMAL(30,6) before the per-doc sum, ONE double
    * division, floor-quantize), then per language rank docs by quantized
    * avg-logprob (DESC = least-perplexing first, doc_id tiebreak) and cut
    * ntile(3) head/middle/tail buckets — the standard keep-the-head /
    * downsample-the-tail corpus filter. The per-doc quantized double is
    * bit-identical across engines, so its DECIMAL(20,6) re-read is exact
    * and the bucket means are order-independent. Shuffles: token groupBy,
    * doc groupBy, the per-lang window — all key-partitioned; nothing
    * corpus-sized crosses a single task. */
  private def perplexityBucketSql(tokRef: String): String =
    s"""WITH freq AS (SELECT tok, count(*) AS c FROM $tokRef GROUP BY tok),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM $tokRef),
       |sc AS (SELECT doc_id, count(*) AS n_tok,
       |         CAST(sum(CAST(ln(c / n) AS DECIMAL(30,6))) AS DOUBLE) AS slp
       |       FROM $tokRef tk JOIN freq USING (tok) CROSS JOIN tot
       |       GROUP BY doc_id),
       |pp AS (SELECT d.lang, sc.doc_id, sc.n_tok,
       |         floor(slp / n_tok * 1e6 + 0.5) / 1e6 AS alp
       |       FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
       |bk AS (SELECT lang, doc_id, n_tok, alp,
       |         ntile(3) OVER (PARTITION BY lang ORDER BY alp DESC, doc_id) AS b
       |       FROM pp)
       |SELECT lang,
       |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  floor(CAST(sum(CAST(alp AS DECIMAL(20,6))) AS DOUBLE) / count(*)
       |    * 1e6 + 0.5) / 1e6 AS mean_logprob
       |FROM bk GROUP BY lang, b ORDER BY lang, bucket""".stripMargin

  /** Sliding-window token chunking (64-token chunks, stride 48 → 16-token
    * overlap) — the RAG / context-window prep step that turns documents
    * into retrievable passages. Pure map-side fan-out: explode a stride
    * sequence per doc, slice the token array, fingerprint the chunk
    * (md5 of the re-joined window, so downstream chunk-level dedup can
    * equi-join on it). No shuffle until the output sort; at 100 TB this
    * is a linear scan with ~n_tok/48 output rows per doc. Engine texts
    * differ only in list spellings (slice/explode vs [a:b]/unnest). */
  private val chunkSparkSql: String =
    """WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, size(toks) AS n FROM t),
      |c AS (SELECT doc_id, n, pos, slice(toks, pos, 64) AS w
      |      FROM s LATERAL VIEW explode(sequence(1, greatest(n, 1), 48)) x AS pos)
      |SELECT doc_id, CAST((pos - 1) DIV 48 + 1 AS BIGINT) AS chunk_idx,
      |  CAST(pos AS BIGINT) AS start_pos, CAST(size(w) AS BIGINT) AS n_tok,
      |  md5(concat_ws(' ', w)) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  private val chunkDuckSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
      |e AS (SELECT doc_id, toks, n,
      |        unnest(generate_series(1, greatest(n, 1), 48)) AS pos
      |      FROM s),
      |c AS (SELECT doc_id, n, pos, toks[pos:least(pos + 63, n)] AS w
      |      FROM e)
      |SELECT doc_id, CAST((pos - 1) // 48 + 1 AS BIGINT) AS chunk_idx,
      |  CAST(pos AS BIGINT) AS start_pos, CAST(len(w) AS BIGINT) AS n_tok,
      |  md5(array_to_string(w, ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** Chunk-level boilerplate detection — the passage-granular rung of the
    * dedup ladder: fingerprint every 64-token window ([[chunkSparkSql]]'s
    * grid) and keep fingerprints seen in MORE THAN ONE distinct document
    * (headers/footers/license blocks that doc-level dedup can't see
    * because the surrounding text differs). One hash-agg shuffle on the
    * chunk fingerprint — q_dedup_exact's linear shape at passage
    * cardinality (~n_tok/48 rows per doc). */
  private val chunkDedupSparkSql: String =
    """WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, size(toks) AS n FROM t),
      |c AS (SELECT doc_id, slice(toks, pos, 64) AS w
      |      FROM s LATERAL VIEW explode(sequence(1, greatest(n, 1), 48)) x AS pos),
      |h AS (SELECT doc_id, md5(concat_ws(' ', w)) AS ch, size(w) AS ntok FROM c)
      |SELECT ch AS chunk_md5, CAST(count(*) AS BIGINT) AS n_occ,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(min(doc_id) AS BIGINT) AS first_doc,
      |  CAST(min(ntok) AS BIGINT) AS n_tok
      |FROM h GROUP BY ch HAVING count(DISTINCT doc_id) > 1
      |ORDER BY 1""".stripMargin

  private val chunkDedupDuckSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
      |e AS (SELECT doc_id, toks, n,
      |        unnest(generate_series(1, greatest(n, 1), 48)) AS pos
      |      FROM s),
      |c AS (SELECT doc_id, toks[pos:least(pos + 63, n)] AS w FROM e),
      |h AS (SELECT doc_id, md5(array_to_string(w, ' ')) AS ch, len(w) AS ntok FROM c)
      |SELECT ch AS chunk_md5, CAST(count(*) AS BIGINT) AS n_occ,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(min(doc_id) AS BIGINT) AS first_doc,
      |  CAST(min(ntok) AS BIGINT) AS n_tok
      |FROM h GROUP BY ch HAVING count(DISTINCT doc_id) > 1
      |ORDER BY 1""".stripMargin

  /** Dedup-funnel report: survivors through exact → normalized → minhash
    * stages, each stage keeping the min-doc_id representative of its key
    * group among the PREVIOUS stage's survivors (the real pipeline runs
    * stages in this order because each is strictly coarser). Three
    * cascaded hash-agg + key-join rounds — every stage linear,
    * map-side-combinable, no pair joins anywhere. `g` = DuckDB's global
    * regex flag; `sig` = the engine's 4-slice minhash spelling (same
    * signature as q_dedup_minhash's). */
  private def dedupFunnelSql(g: String, sig: String): String =
    s"""WITH k AS (SELECT doc_id, md5(text) AS ek,
       |        md5(trim(regexp_replace(regexp_replace(lower(text),
       |          '[^a-z0-9 ]', ''$g), '  +', ' '$g))) AS nk,
       |        $sig AS mk
       |      FROM documents),
       |s1 AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY ek),
       |k1 AS (SELECT k.doc_id, k.nk, k.mk FROM k JOIN s1 ON k.doc_id = s1.doc_id),
       |s2 AS (SELECT min(doc_id) AS doc_id FROM k1 GROUP BY nk),
       |k2 AS (SELECT k1.doc_id, k1.mk FROM k1 JOIN s2 ON k1.doc_id = s2.doc_id),
       |s3 AS (SELECT min(doc_id) AS doc_id FROM k2 GROUP BY mk),
       |c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k),
       |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
       |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
       |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s3)
       |SELECT CAST(1 AS BIGINT) AS stage_id, 'exact' AS stage,
       |  c0.n AS n_in, c1.n AS n_out, c0.n - c1.n AS n_removed
       |FROM c0 CROSS JOIN c1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), 'normalized', c1.n, c2.n, c1.n - c2.n
       |FROM c1 CROSS JOIN c2
       |UNION ALL
       |SELECT CAST(3 AS BIGINT), 'minhash', c2.n, c3.n, c2.n - c3.n
       |FROM c2 CROSS JOIN c3
       |ORDER BY 1""".stripMargin

  // ---- DSIR importance resampling ---------------------------------------
  //
  // Data Selection with Importance Resampling (Xie et al. 2023, public):
  // score every candidate document by how much more likely its hashed
  // n-gram features are under a TARGET domain than under the raw pool,
  // then keep the top-scoring docs. Target sample = doc_id % 10 = 0;
  // candidates = the rest. Features = word bigrams hashed into 64
  // buckets (md5 — the engine-portable hash, see the header note).
  //
  // Exactness: the per-bucket log-likelihood ratio
  //   λ_b = ln( (tc_b+1)(R+64) / ((rc_b+1)(T+64)) )   (Laplace smoothing)
  // is ONE double ln of an exactly-representable rational (all operands
  // are BIGINT counts; the products stay < 2^53 at every tested SF),
  // floor-quantized to ppm BEFORE any sum — the unigram-trainer
  // discipline, so each doc's score Σ n_b·λ_b is exact BIGINT.
  //
  // Scale shape: the bigram fan-out is the big relation — on the Spark
  // side it is materialized ONCE via localCheckpoint (it feeds the
  // target counts, the pool counts, and the per-doc scores; Catalyst
  // would inline the 3-way-referenced CTE and explode the corpus three
  // times — the q_text_contamination lesson). λ is a 64-row relation
  // that broadcasts; scoring is one map-side-combinable aggregate.
  // Docs with < 2 tokens have no features and drop out of the pool.

  /** Bucketed-bigram fan-out, Spark spelling (DuckDB twin inlined in the
    * oracle below): b = first-8-hex of md5(bigram) mod 64. */
  private[graft] val dsirBgSparkSql: String =
    """SELECT doc_id, lang,
      |  CAST(conv(substring(md5(pair), 1, 8), 16, 10) AS BIGINT) % 64 AS b
      |FROM (SELECT doc_id, lang,
      |        explode(zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
      |                         (x, y) -> concat(x, ' ', y))) AS pair
      |      FROM (SELECT doc_id, lang, split(text, ' ') AS t FROM documents
      |            WHERE length(text) > 0) d) p""".stripMargin

  private[graft] val dsirBgDuckSql: String =
    """SELECT doc_id, lang,
      |  CAST(CAST(concat('0x', substring(md5(pair), 1, 8)) AS BIGINT) % 64 AS BIGINT) AS b
      |FROM (SELECT doc_id, lang,
      |        unnest(list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
      |                              z -> concat(z[1], ' ', z[2]))) AS pair
      |      FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      |            WHERE length(text) > 0) d) p""".stripMargin

  /** Shared scoring/selection text over the bucketed-bigram relation
    * `bgRef(doc_id, lang, b)`: smoothed per-bucket log-ratios, exact
    * BIGINT doc scores, top-50 candidates by (score, doc_id). */
  private[graft] def dsirRestSql(bgRef: String, pre: String = ""): String =
    s"""WITH ${pre}tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tc
       |            FROM $bgRef WHERE doc_id % 10 = 0 GROUP BY b),
       |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS rc
       |        FROM $bgRef WHERE doc_id % 10 <> 0 GROUP BY b),
       |tot AS (SELECT (SELECT CAST(coalesce(sum(tc), 0) AS BIGINT) FROM tgt) AS tt,
       |               (SELECT CAST(coalesce(sum(rc), 0) AS BIGINT) FROM raw) AS rt),
       |lam AS (SELECT bs.b,
       |          CAST(floor(ln(
       |            (CAST((coalesce(t.tc, 0) + 1) * (tot.rt + 64) AS DOUBLE))
       |            / (CAST((coalesce(r.rc, 0) + 1) * (tot.tt + 64) AS DOUBLE))
       |          ) * 1e6 + 0.5) AS BIGINT) AS lam_ppm
       |        FROM (SELECT DISTINCT b FROM $bgRef) bs
       |        LEFT JOIN tgt t ON t.b = bs.b
       |        LEFT JOIN raw r ON r.b = bs.b
       |        CROSS JOIN tot),
       |sc AS (SELECT g.doc_id, min(g.lang) AS lang,
       |         CAST(sum(l.lam_ppm) AS BIGINT) AS score_ppm
       |       FROM $bgRef g JOIN lam l ON l.b = g.b
       |       WHERE g.doc_id % 10 <> 0
       |       GROUP BY g.doc_id)
       |SELECT rnk, doc_id, lang, score_ppm FROM (
       |  SELECT doc_id, lang, score_ppm,
       |    row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rnk
       |  FROM sc) r
       |WHERE rnk <= 50 ORDER BY rnk""".stripMargin

  private def run(s: SparkSession, sf: String, sql: String): DataFrame = {
    Tables.documents(s, sf).createOrReplaceTempView("documents")
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_dsir" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      s.sql(dsirBgSparkSql).loopCheckpoint()
        .createOrReplaceTempView("dsir_bg")
      s.sql(dsirRestSql("dsir_bg"))
    }),
    "q_pipeline_split" -> ((s, sf) => run(s, sf, splitSql("STRING"))),
    "q_text_contamination" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      s.sql(contaminationGramSparkSql).loopCheckpoint()
        .createOrReplaceTempView("g")
      s.sql(contaminationRestSparkSql)
    }),
    "q_pipeline_pack" -> ((s, sf) => run(s, sf, packSparkSql)),
    "q_pipeline_dataset_card" -> ((s, sf) => run(s, sf, cardSparkSql)),
    "q_text_unigram_logprob" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      s.sql(logprobTokSparkSql).loopCheckpoint()
        .createOrReplaceTempView("lp_tok")
      s.sql(logprobRestSql("lp_tok"))
    }),
    // Deterministic per-epoch reshuffle — training loaders need each
    // epoch to be a DIFFERENT but REPRODUCIBLE permutation of the
    // corpus. Order key = md5(epoch:doc_id): pure per-row function, so
    // any worker/partitioning/rerun agrees; per-epoch ranks run in an
    // epoch-partitioned window (WindowGroupLimit under the rk filter —
    // per-partition top-k). The 3×5 head emitted per epoch is the
    // auditable proof that epochs permute independently.
    "q_pipeline_epoch_shuffle" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      s.sql(epochShuffleSql(
        epochs = "SELECT explode(sequence(1, 3)) AS epoch", cast = "STRING"))
    }),
    "q_text_bigram_logprob" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      s.sql(bigramTokSparkSql).loopCheckpoint()
        .createOrReplaceTempView("lp_bg")
      s.sql(bigramRestSql("lp_bg"))
    }),
    "q_text_kneser_ney" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      // the bigram relation feeds four statements (pair/prefix/suffix
      // stats + the scoring join) — materialize it once
      s.sql(bigramTokSparkSql).loopCheckpoint()
        .createOrReplaceTempView("kn_bg")
      s.sql(knRestSql("kn_bg"))
    }),
    "q_text_perplexity_bucket" -> ((s, sf) => {
      Tables.documents(s, sf).createOrReplaceTempView("documents")
      // token relation feeds freq, tot AND the scoring join — materialize once
      s.sql(logprobTokSparkSql).loopCheckpoint()
        .createOrReplaceTempView("ppb_tok")
      s.sql(perplexityBucketSql("ppb_tok"))
    }),
    "q_text_chunk" -> ((s, sf) => run(s, sf, chunkSparkSql)),
    "q_dedup_chunks" -> ((s, sf) => run(s, sf, chunkDedupSparkSql)),
    "q_pipeline_dedup_funnel" -> ((s, sf) => run(s, sf, dedupFunnelSql(
      g = "",
      sig = "concat_ws(',', slice(sort_array(transform(" +
        "array_distinct(split(text, ' ')), t -> md5(t))), 1, 4))"))),
    "q_pipeline_mix" -> ((s, sf) => run(s, sf, mixSparkSql)),
    "q_pipeline_curriculum" -> ((s, sf) => run(s, sf, curriculumSparkSql)),
    "q_pipeline_interleave" -> ((s, sf) => run(s, sf, interleaveSql("STRING"))),
    "q_pipeline_token_budget" -> ((s, sf) => run(s, sf,
      tokenBudgetSql(toklen = "size(split(text, ' '))", idiv = "DIV"))),
    "q_pipeline_temperature_mix" -> ((s, sf) => run(s, sf,
      temperatureMixSql(idiv = "DIV")))
  )

  /** Largest-remainder apportionment of a fixed token budget across
    * sources ∝ their token mass — the exact-integer allocation step of
    * dataset mixing (q_pipeline_mix computes target WEIGHTS; this turns
    * them into an integer token ledger that sums to the budget EXACTLY,
    * which floats cannot guarantee). Everything is 64-bit integer
    * arithmetic (floor quotas + ranked remainders), so both engines
    * produce bit-identical ledgers; one scan + a source-sized window.
    * `toklen`/`idiv` render the two engine spelling gaps. */
  private[graft] def tokenBudgetSql(toklen: String, idiv: String): String =
    s"""WITH tc AS (SELECT source, CAST(sum($toklen) AS BIGINT) AS toks
       |            FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM tc),
       |q AS (SELECT source, toks,
       |        (toks * 100000) $idiv total AS floor_alloc,
       |        (toks * 100000) % total AS rem
       |      FROM tc CROSS JOIN t),
       |r AS (SELECT source, toks, floor_alloc,
       |        row_number() OVER (ORDER BY rem DESC, source) AS rr,
       |        100000 - sum(floor_alloc) OVER () AS leftover
       |      FROM q)
       |SELECT source, toks AS n_tokens,
       |  CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM r ORDER BY source""".stripMargin

  /** Temperature-based source mixing (α = 0.5): sampling weight ∝ √n_s —
    * the standard upsample-the-rare-source schedule multilingual /
    * multi-domain training uses, at the one temperature whose power is
    * IEEE-exact in both engines (sqrt; a libm pow(x, 0.7) is not
    * portable). The weight is integer-scaled (floor(√n·1e9 + 0.5) —
    * exact BIGINT), so the Hamilton apportionment of the 10,000-doc
    * budget runs in pure integer arithmetic like [[tokenBudgetSql]]:
    * ledger sums to the budget exactly, remainder ranks break ties by
    * source. Products stay far under 2⁶³ (≤ ~2e16). The windows run
    * over the sources-bounded relation — the same bounded pattern as
    * the token budget. */
  private[graft] def temperatureMixSql(idiv: String): String =
    s"""WITH sc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |            FROM documents GROUP BY source),
       |w AS (SELECT source, n_docs,
       |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS iw
       |      FROM sc),
       |t AS (SELECT CAST(sum(iw) AS BIGINT) AS tw FROM w),
       |q AS (SELECT source, n_docs, iw, tw,
       |        (iw * 10000) $idiv tw AS floor_alloc,
       |        (iw * 10000) % tw AS rem
       |      FROM w CROSS JOIN t),
       |r AS (SELECT source, n_docs, iw, tw, floor_alloc,
       |        row_number() OVER (ORDER BY rem DESC, source) AS rr,
       |        10000 - sum(floor_alloc) OVER () AS leftover
       |      FROM q)
       |SELECT source, n_docs,
       |  floor(CAST(iw AS DOUBLE) / tw * 1e6 + 0.5) / 1e6 AS share,
       |  CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS target_docs
       |FROM r ORDER BY source""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pipeline_dsir" ->
      dsirRestSql("bg", pre = s"bg AS (\n$dsirBgDuckSql),\n"),
    "q_pipeline_temperature_mix" -> temperatureMixSql(idiv = "//"),
    "q_pipeline_split" -> splitSql("VARCHAR"),
    "q_text_contamination" -> contaminationDuckSql,
    "q_pipeline_pack" -> packDuckSql,
    "q_pipeline_dataset_card" -> cardDuckSql,
    "q_text_unigram_logprob" -> logprobDuckSql,
    "q_text_bigram_logprob" -> bigramLogprobDuckSql,

    "q_text_kneser_ney" -> knRestSql(
      """(SELECT doc_id,
        |   unnest(list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
        |                         z -> concat(z[1], ' ', z[2]))) AS bg
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin),
    "q_text_perplexity_bucket" -> perplexityBucketSql(
      """(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)"""),
    "q_text_chunk" -> chunkDuckSql,
    "q_dedup_chunks" -> chunkDedupDuckSql,
    "q_pipeline_dedup_funnel" -> dedupFunnelSql(
      g = ", 'g'",
      sig = "array_to_string(list_slice(list_sort(list_transform(" +
        "list_distinct(string_split(text, ' ')), t -> md5(t))), 1, 4), ',')"),
    "q_pipeline_epoch_shuffle" -> epochShuffleSql(
      epochs = "SELECT unnest(generate_series(1, 3)) AS epoch", cast = "VARCHAR"),
    "q_pipeline_mix" -> mixDuckSql,
    "q_pipeline_curriculum" -> curriculumDuckSql,
    "q_pipeline_interleave" -> interleaveSql("VARCHAR"),
    "q_pipeline_token_budget" -> tokenBudgetSql(
      toklen = "len(string_split(text, ' '))", idiv = "//")
  )
}
