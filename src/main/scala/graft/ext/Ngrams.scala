package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** N-gram statistics over the corpus: collocation mining (lift-ranked
  * bigrams — the PMI-style "which word pairs travel together" report
  * every corpus audit starts with) and bigram language-model scoring
  * (the CCNet/C4 perplexity-filter shape: score each document by how
  * predictable its token stream is under a model trained on the whole
  * corpus).
  *
  * Exactness: both ops avoid floating point entirely. Lift and LM
  * probabilities are fixed-point BIGINTs produced by integer division
  * of exact counts (`x DIV y` in Spark ≡ `x // y` in DuckDB for
  * non-negative operands), so results are bit-identical across engines
  * and across any partitioning — the same discipline as
  * `embedding_kmeans` / `graph_pagerank` (integer fixed-point for
  * anything iterative or ranked). No `log` anywhere: lift replaces PMI
  * (monotone transform of the same ratio), and the LM score is a mean
  * probability rather than a log-perplexity — same ordering of
  * documents, zero libm portability risk.
  *
  * Scale shape (the 100 TB story):
  *   - The bigram-position relation is a narrow explode of the token
  *     array — no shuffle to build it.
  *   - Count tables are VOCABULARY-bounded (unigrams ≤ |V|, observed
  *     bigrams ≤ corpus positions but heavy-hitter-skewed); the
  *     positions→counts joins are plain equi-joins that AQE broadcasts
  *     when the count side is small, and shuffle-hash otherwise. No
  *     all-pairs anything.
  *   - Global scalars (token total, vocab size) are 1-row aggregates
  *     cross-joined in — broadcast by construction.
  *   - `text_lm_score` re-aggregates by doc_id: partial aggs apply
  *     (sum/count), one exchange.
  */
object Ngrams {

  /** (doc_id, w1, w2) for every adjacent token pair, in document
    * order. One window (lead over doc_id) — at scale this is a narrow
    * map over the token explode because the window key is the explode
    * parent. */
  private def bigramPositions(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    docs
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("i", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
  }

  private val bigramsCte: String =
    """t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
      |  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
      |  WHERE len(toks) >= 2)""".stripMargin

  /** Top-k collocations by conditional lift
    * `P(w2 | w1) / P(w2) = c_ab * N_tok / (c_a * c_b)` (a monotone
    * transform of PMI), held as fixed-point ×10^6 BIGINT. `c_a`/`c_b`
    * are unigram counts over ALL token positions, `N_tok` the corpus
    * token total. Support floor keeps noise pairs out; ties break on
    * (w1, w2) for a total order. BIGINT headroom: c_ab·N_tok·10^6 at
    * petabyte scale wants DECIMAL(38,0) — the cast is the only change
    * this plan would need. */
  def collocations(docs: DataFrame, minSupport: Long = 5L,
      k: Int = 50): DataFrame = {
    val toks = docs.select(
      col("doc_id"), explode(Dedup.tokens(col("text"))).as("w"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    // measured-and-rejected: n_tok = uni.agg(sum(c)) (re-aggregate the
    // vocabulary-bounded table) read 0.98 → 1.60 s steady — the join
    // side's pushed isnotnull(w) makes the two uni subtrees differ, so
    // AQE stage reuse stops deduping them and the tokenize pass runs
    // TWICE. The direct count scans only the token column and
    // whole-stage-codegens to a row count.
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val pairs = bigramPositions(docs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("(c_ab * n_tok * 1000000L) div (c_a * c_b)").as("lift_fp"))
      .orderBy(col("lift_fp").desc, col("w1"), col("w2"))
      .limit(k)
  }

  def collocationsSql(minSupport: Long = 5L, k: Int = 50): String =
    s"""WITH $bigramsCte,
       |tok AS (SELECT unnest(toks) AS w FROM t),
       |uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
       |n AS (SELECT COUNT(*) AS n_tok FROM tok),
       |pairs AS (
       |  SELECT w1, w2, COUNT(*) AS c_ab FROM bg GROUP BY w1, w2
       |  HAVING COUNT(*) >= $minSupport)
       |SELECT p.w1, p.w2, p.c_ab,
       |       (p.c_ab * n.n_tok * 1000000) // (a.c * b.c) AS lift_fp
       |FROM pairs p
       |JOIN uni a ON a.w = p.w1
       |JOIN uni b ON b.w = p.w2
       |CROSS JOIN n
       |ORDER BY lift_fp DESC, p.w1, p.w2
       |LIMIT $k""".stripMargin

  /** Bigram LM with add-one smoothing, trained on the corpus and
    * applied back to every document (the self-scoring degenerate case
    * of the CCNet filter — swapping in a reference corpus changes only
    * the `docs` argument of the count stage). Per bigram position,
    * `P(w2 | w1) = (c_ab + 1) / (c_hist + V)` as fixed-point ×10^9;
    * the document score is the exact integer mean over its positions.
    * Documents with < 2 tokens surface with n_bigrams = 0 and a NULL
    * score — visible, not dropped. */
  def lmScore(docs: DataFrame): DataFrame = {
    val bg = bigramPositions(docs)
    val pairC = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    // c_hist(w1) = Σ_w2 c_ab(w1, w2) exactly — re-aggregate the
    // vocabulary-bounded pair table instead of a second corpus-wide
    // bigram pass (one exchange over |observed bigrams| rows replaces
    // a scan + explode + window over every token position)
    val histC = pairC.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_hist"))
    val vocab = docs
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bg
      .join(pairC, Seq("w1", "w2"))
      .join(histC, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr("((c_ab + 1) * 1000000000L) div (c_hist + v)").as("p_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("sum_p"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_p div n_bigrams").as("lm_score_fp"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score_fp"))
      .orderBy(col("doc_id"))
  }

  lazy val lmScoreSql: String =
    s"""WITH $bigramsCte,
       |pc AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bg GROUP BY w1, w2),
       |hc AS (SELECT w1, COUNT(*) AS c_hist FROM bg GROUP BY w1),
       |voc AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM t)),
       |scored AS (
       |  SELECT bg.doc_id,
       |         ((pc.c_ab + 1) * 1000000000) // (hc.c_hist + voc.v) AS p_fp
       |  FROM bg JOIN pc USING (w1, w2) JOIN hc USING (w1) CROSS JOIN voc),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(p_fp) AS sum_p
       |  FROM scored GROUP BY doc_id)
       |SELECT t.doc_id,
       |       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       |       CAST(a.sum_p // a.n_bigrams AS BIGINT) AS lm_score_fp
       |FROM t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much its unigram profile looks like a TARGET distribution
    * (here: the corpus' English documents) relative to the full-corpus
    * distribution, and keep the top-k. Per token position the
    * importance ratio `p_target(w) / p_corpus(w)` with add-one
    * smoothing on both sides is fixed-point ×10^6; the document score
    * is the exact integer mean — the hashed-n-gram variant of the
    * paper collapses to exactly this shape with unigram features.
    *
    * Scale shape: identical to `lmScore` — narrow token explode, two
    * vocabulary-bounded count tables (target counts LEFT-joined so
    * out-of-target tokens score by smoothing alone), broadcast scalars,
    * one doc-keyed partial agg. Swapping the target to an external
    * reference corpus changes only the `c_t` count stage. */
  def dsirSelect(docs: DataFrame, targetLang: String = "en",
      k: Int = 100): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(Dedup.tokens(col("text"))).as("w"))
    // ONE count pass builds both distributions (c_t as a conditional
    // sum — zero, never NULL, so the smoothing term is unchanged), and
    // every global scalar is a re-aggregate of the vocabulary-bounded
    // count table: n_s = Σc_s, v = |rows|, n_t = Σc_t. The old shape
    // derived `toks` FIVE times (cs, ct, two scalar aggregates, the
    // scoring join) — five corpus-wide tokenize passes for a plan that
    // needs two (count, then score).
    val cnt = toks.groupBy(col("w")).agg(
      count(lit(1)).as("c_s"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_t"))
    val scal = cnt.agg(sum(col("c_s")).as("n_s"),
      count(lit(1)).as("v"), sum(col("c_t")).as("n_t"))
    val scored = toks
      .join(cnt, Seq("w"))
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        expr("""((c_t + 1) * (n_s + v) * 1000000L)
               | div ((c_s + 1) * (n_t + v))""".stripMargin).as("r_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r_fp")).as("sum_r"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_r div n_tokens").as("dsir_fp"))
    scored.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("dsir_fp"))
      .orderBy(col("dsir_fp").desc, col("doc_id"))
      .limit(k)
  }

  def dsirSelectSql(targetLang: String = "en", k: Int = 100): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |tok AS (SELECT doc_id, lang, unnest(toks) AS w FROM t),
       |cs AS (SELECT w, COUNT(*) AS c_s FROM tok GROUP BY w),
       |ct AS (SELECT w, COUNT(*) AS c_t FROM tok
       |       WHERE lang = '$targetLang' GROUP BY w),
       |scal AS (
       |  SELECT (SELECT COUNT(*) FROM tok) AS n_s,
       |         (SELECT COUNT(DISTINCT w) FROM tok) AS v,
       |         (SELECT COUNT(*) FROM tok WHERE lang = '$targetLang') AS n_t),
       |scored AS (
       |  SELECT tok.doc_id,
       |         ((COALESCE(ct.c_t, 0) + 1) * (scal.n_s + scal.v) * 1000000)
       |           // ((cs.c_s + 1) * (scal.n_t + scal.v)) AS r_fp
       |  FROM tok JOIN cs USING (w) LEFT JOIN ct USING (w) CROSS JOIN scal),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(r_fp) AS sum_r
       |  FROM scored GROUP BY doc_id)
       |SELECT a.doc_id, d.lang, a.n_tokens,
       |       CAST(a.sum_r // a.n_tokens AS BIGINT) AS dsir_fp
       |FROM agg a JOIN t d USING (doc_id)
       |ORDER BY dsir_fp DESC, a.doc_id
       |LIMIT $k""".stripMargin

  /** CCNet-style head/middle/tail routing (Wenzek et al. 2020 shape):
    * within each language, documents rank by their LM score and split
    * 10/40/50 into head (cleanest), middle, tail — the bucket table a
    * curation pipeline reads to decide what trains, what gets a second
    * look, what drops. Tie-respecting by construction: the decile index
    * is rows_before·10 div n computed on the DISTINCT-score cumulative
    * (the A12b relation — all docs sharing a score share a bucket, the
    * window is bounded by score cardinality, never a per-doc rank).
    * Unscorable docs (< 2 tokens → NULL score) route to tail
    * explicitly. Surfaces per (lang, bucket): docs and char mass. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(lmScore(docs).select(col("doc_id"), col("lm_score_fp")),
        Seq("doc_id"))
    val byValue = scored
      .groupBy(col("lang"), col("lm_score_fp"))
      .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("mass"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("lm_score_fp").desc_nulls_last)
    val cum = byValue
      .withColumn("before", coalesce(sum(col("c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
    cum
      .withColumn("bucket",
        when(col("lm_score_fp").isNull, "tail")
          .when(expr("before * 10 div n") < 1, "head")
          .when(expr("before * 10 div n") < 5, "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("c")).as("n_docs"), sum(col("mass")).as("mass"))
      .orderBy(col("lang"), col("bucket"))
  }

  lazy val ccnetBucketsSql: String =
    s"""WITH $bigramsCte,
       |pc AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bg GROUP BY w1, w2),
       |hc AS (SELECT w1, COUNT(*) AS c_hist FROM bg GROUP BY w1),
       |voc AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM t)),
       |sc AS (
       |  SELECT bg.doc_id,
       |         ((pc.c_ab + 1) * 1000000000) // (hc.c_hist + voc.v) AS p_fp
       |  FROM bg JOIN pc USING (w1, w2) JOIN hc USING (w1) CROSS JOIN voc),
       |ds AS (
       |  SELECT doc_id, CAST(SUM(p_fp) // COUNT(*) AS BIGINT) AS lm_score_fp
       |  FROM sc GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, d.lang, d.n_chars, ds.lm_score_fp
       |  FROM documents d LEFT JOIN ds USING (doc_id)),
       |bv AS (
       |  SELECT lang, lm_score_fp, COUNT(*) AS c,
       |    CAST(SUM(n_chars) AS BIGINT) AS mass
       |  FROM scored GROUP BY lang, lm_score_fp),
       |cum AS (
       |  SELECT lang, lm_score_fp, c, mass,
       |    CAST(COALESCE(SUM(c) OVER (PARTITION BY lang
       |      ORDER BY lm_score_fp DESC NULLS LAST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS bef,
       |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
       |  FROM bv)
       |SELECT lang,
       |  CASE WHEN lm_score_fp IS NULL THEN 'tail'
       |       WHEN bef * 10 // n < 1 THEN 'head'
       |       WHEN bef * 10 // n < 5 THEN 'middle'
       |       ELSE 'tail' END AS bucket,
       |  CAST(SUM(c) AS BIGINT) AS n_docs, CAST(SUM(mass) AS BIGINT) AS mass
       |FROM cum GROUP BY 1, 2
       |ORDER BY lang, bucket""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "corpus_ccnet_buckets" -> QueryDef(
      (s, d) => ccnetBuckets(Tables.documents(s, d)),
      ccnetBucketsSql),
    "text_collocations" -> QueryDef(
      (s, d) => collocations(Tables.documents(s, d)),
      collocationsSql()),
    "text_lm_score" -> QueryDef(
      (s, d) => lmScore(Tables.documents(s, d)),
      lmScoreSql),
    "corpus_dsir" -> QueryDef(
      (s, d) => dsirSelect(Tables.documents(s, d)),
      dsirSelectSql()))
}
