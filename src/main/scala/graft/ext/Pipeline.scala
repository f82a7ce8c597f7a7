package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Training-data pipeline preparation operators: sequence packing,
  * source-mixture weighting, and deterministic dataset splits — the
  * steps between a cleaned corpus (`Corpus`) and a training run.
  *
  * None of these exist in the reference (`/root/reference/fianl2.py`
  * stops at the analytical summary); they are [EXT] operators per
  * SURVEY.md §2.11, designed for the 100 TB regime:
  *
  *  - packing is SHARD-LOCAL (window keyed on (source, shard)), so
  *    parallelism scales with the shard count, not the source count;
  *  - mixture weighting reduces the corpus to one row per source
  *    before any math (partial aggregation does the heavy lifting);
  *  - split assignment is a pure narrow map — no RNG state, no
  *    shuffle, bit-identical on re-run, which is what makes a
  *    multi-day 100 TB job resumable without a split-manifest.
  */
object Pipeline {

  /** Tokens per document, counted exactly like the chunker/oracle do:
    * whitespace split with empty strings dropped. */
  private def nTokens(text: Column): Column =
    size(graft.functions.WordShingles.word_ngrams(text, 1))

  // ---------------------------------------------------------------- packing

  /** Sequence packing: lay each shard's documents end-to-end (ordered
    * by doc_id) into fixed `seqLen`-token training sequences and report
    * which sequences each document lands in. A document whose tokens
    * straddle a sequence boundary is flagged — the share of straddlers
    * is the packing-efficiency signal a pipeline tunes `seqLen` with.
    *
    * Packing is shard-local: the running sum is windowed on
    * (source, shard = doc_id % nShards), never globally, so the plan is
    * one hash exchange into source×nShards independent windows. A
    * global pack would serialize 100 TB through one range-partitioned
    * running sum for no training benefit — shard boundaries are free
    * sequence boundaries (every real packer cuts there anyway).
    *
    * All arithmetic is integer (BIGINT token counts, integer division
    * by `seqLen`), so the oracle comparison is exact by construction.
    */
  def packSequences(docs: DataFrame, seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1 && nShards >= 1,
      s"need seqLen >= 1 and nShards >= 1, got $seqLen, $nShards")
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        (col("doc_id") % nShards).as("shard"),
        nTokens(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(cum - 1) div $seqLen").as("last_seq"))
      .withColumn("straddles", col("first_seq") =!= col("last_seq"))
      .orderBy(col("doc_id"))
  }

  def packSequencesSql(seqLen: Int, nShards: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, source, doc_id % $nShards AS shard,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t WHERE n_tokens >= 1)
       |SELECT doc_id, source, shard, n_tokens,
       |  CAST((cum - n_tokens) // $seqLen AS BIGINT) AS first_seq,
       |  CAST((cum - 1) // $seqLen AS BIGINT) AS last_seq,
       |  (cum - n_tokens) // $seqLen <> (cum - 1) // $seqLen AS straddles
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- mixture

  /** Temperature-scaled source mixture: sampling weights proportional
    * to (token count)^(1/2) — the standard multilingual/multi-source
    * rebalancing that upweights small sources without letting a huge
    * one drown the mix. Emits, per source, the weight and the document
    * allocation out of `budget`.
    *
    * Cross-engine exactness (the reason this can be hash-compared at
    * all): sqrt is correctly rounded IEEE in both engines, and the
    * result is snapped to the 2^-20 grid — quantized weights are small
    * multiples of 2^-20, so their ~20-term sum is EXACT (order
    * independent) and every downstream ratio is a single correctly
    * rounded division. Same trick as the IVF centroid oracle
    * (`Similarity.scala`). The corpus collapses to one row per source
    * via partial-aggregated SUM/COUNT before any of this math runs.
    */
  def mixtureWeights(docs: DataFrame, budget: Long): DataFrame = {
    val perSource = docs
      .select(col("source"), nTokens(col("text")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val q = (floor(sqrt(col("n_tokens").cast("double")) * lit(1048576.0)) /
      lit(1048576.0)).as("q")
    val scored = perSource.select(col("source"), col("n_docs"), col("n_tokens"), q)
    val total = scored.agg(sum(col("q")).as("qtot"))
    scored.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("q") / col("qtot")).as("weight"),
        floor(col("q") / col("qtot") * budget).cast("long").as("alloc_docs"))
      .orderBy(col("source"))
  }

  def mixtureWeightsSql(budget: Long): String =
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |      AS n
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n) AS BIGINT) AS n_tokens,
       |    floor(sqrt(CAST(SUM(n) AS DOUBLE)) * 1048576.0) / 1048576.0 AS q
       |  FROM t GROUP BY source)
       |SELECT source, n_docs, n_tokens,
       |  q / (SELECT SUM(q) FROM s) AS weight,
       |  CAST(floor(q / (SELECT SUM(q) FROM s) * $budget) AS BIGINT) AS alloc_docs
       |FROM s ORDER BY source""".stripMargin

  // ------------------------------------------------------------------ split

  /** Deterministic train/val/test assignment: u = first 8 hex chars of
    * md5("split:" || doc_id) as a uniform in [0,1), thresholded at the
    * cumulative fractions. The "split:" salt decorrelates the holdout
    * from `Corpus.stratifiedSample`'s keep-decision (same doc_id, same
    * md5 family, independent bits) — without it, sampling at rate r
    * would preferentially keep one side of the split.
    *
    * Pure narrow map: no shuffle, no RNG state, bit-identical across
    * engines, runs, and partitionings — re-running assignment over
    * 100 TB reproduces the exact split with no manifest to store.
    */
  def splitAssign(docs: DataFrame, trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"need 0 < train, 0 <= val, train + val < 1; got $trainFrac, $valFrac")
    val u = (conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      4294967296.0).as("u")
    docs.select(col("doc_id"), col("source"), u)
      .withColumn("split",
        when(col("u") < trainFrac, "train")
          .when(col("u") < trainFrac + valFrac, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  def splitAssignSql(trainFrac: Double, valFrac: Double): String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |      / 4294967296.0 AS u
       |  FROM documents)
       |SELECT doc_id, source, u,
       |  CASE WHEN u < $trainFrac THEN 'train'
       |       WHEN u < ${trainFrac + valFrac} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM t ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ declared queries

  private val q: Seq[(String, QueryDef)] = Seq(
    "corpus_pack" -> QueryDef(
      (s, d) => packSequences(Tables.documents(s, d), seqLen = 256, nShards = 4),
      packSequencesSql(256, 4)),
    "corpus_mixture" -> QueryDef(
      (s, d) => mixtureWeights(Tables.documents(s, d), budget = 10000L),
      mixtureWeightsSql(10000L)),
    "corpus_split" -> QueryDef(
      (s, d) => splitAssign(Tables.documents(s, d), trainFrac = 0.8, valFrac = 0.1),
      splitAssignSql(0.8, 0.1))
  )

  def queries: Seq[(String, QueryDef)] = q
}
