package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Approximate-nearest-neighbor search over embedding columns (SURVEY.md
  * §2.11 L3).
  *
  * Brute-force cosine top-k is the exactness baseline: one broadcast of
  * the query vector, one narrow map computing dot/norms with array HOFs
  * (codegen'd, no UDF), one global top-k (TakeOrdered — no full sort).
  * At 100 TB the scan dominates and parallelizes perfectly.
  *
  * The scale path is IVF-style cell probing: vectors are bucketed by a
  * deterministic coarse quantizer (sign-bit LSH over hash-derived
  * hyperplanes), the query probes only its own cell — a partition-pruned
  * fraction of the corpus. Recall vs the brute-force baseline is asserted
  * in SimilaritySpec.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a fold — strictly left-to-right double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** HOF formulation — interpreted (CodegenFallback); kept as the
    * differential-testing twin of the native expression. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd expression (graft.functions.CosineSimilarity);
    * bit-identical to `cosineHof` (same accumulation order), ~10× the
    * throughput in the brute-force scan. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_similarity(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k for one query vector (vec_id = qId).
    * Output is rank-only (ids, not scores) so the oracle compare is
    * immune to last-bit float accumulation differences. */
  def bruteForceTopK(spark: SparkSession, dir: String, qId: Long, k: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === qId).select(col("v").as("q"))
    e.filter(col("vec_id") =!= qId)
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("v"), col("q")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("rank"))
  }

  val bruteForceTopKSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |scored AS (
      |  SELECT e.vec_id,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
      |  FROM e, q WHERE e.vec_id <> 0)
      |SELECT vec_id AS neighbor_id,
      |  CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
      |FROM scored
      |ORDER BY cos DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Deterministic hyperplane component for (plane p, dimension i):
    * a pseudo-random ±[0,1) double derived from xxhash64 — reproducible
    * across runs/partitions with no RNG state. */
  private def planeComponent(p: Int, i: Column): Column =
    (call_function("shiftright", xxhash64(lit(p), i), lit(11)).cast("double")
      / (1L << 53).toDouble) * 2.0 - 1.0

  /** Sign-bit LSH cell id over `nPlanes` hash-derived hyperplanes. */
  def lshCell(v: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** IVF/LSH-bucketed ANN: probe only the query's cell. `signatures`
    * shuffle once on cell id; at scale the cells are written bucketed so
    * repeated queries prune partitions instead of scanning. */
  def lshTopK(spark: SparkSession, dir: String, qId: Long, k: Int,
      nPlanes: Int = 4): DataFrame = {
    val dim = 64
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("cell", lshCell(col("v"), dim, nPlanes))
    val q = e.filter(col("vec_id") === qId)
      .select(col("v").as("q"), col("cell").as("qcell"))
    e.filter(col("vec_id") =!= qId)
      .join(broadcast(q), col("cell") === col("qcell"))
      .withColumn("cos", cosine(col("v"), col("q")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("neighbor_id"), col("cos"))
  }

  /** IVF search with a trained coarse quantizer: assign every vector to
    * its nearest centroid cell, then probe only the query's `nprobe`
    * nearest cells. Centroids are tiny (cells × dim) → broadcast; cell
    * assignment is one narrow map over the corpus; at scale the
    * assignment is precomputed and the table is written partitioned by
    * cell, so a query prunes partitions instead of scanning. */
  def ivfTopK(spark: SparkSession, dir: String, qId: Long, k: Int,
      nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = labelCentroids(emb)
      .select(col("label").as("cell"), col("centroid"))
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // nearest-centroid assignment: small cross join vs broadcast centroids
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdist").asc, col("cell"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cdist", -cosine(col("v"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
    val qCells = assigned.filter(col("vec_id") === qId)
      .crossJoin(broadcast(cents.select(col("cell").as("probe_cell"), col("centroid"))))
      .withColumn("cdist", -cosine(col("v"), col("centroid")))
      .orderBy(col("cdist").asc, col("probe_cell"))
      .limit(nprobe)
      .select(col("probe_cell"), col("v").as("q"))
    assigned.filter(col("vec_id") =!= qId)
      .join(broadcast(qCells), col("cell") === col("probe_cell"))
      .withColumn("cos", cosine(col("v"), col("q")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("neighbor_id"), col("cos"), col("cell"))
  }

  /** Centroid of each labelled cluster — the "train the coarse
    * quantizer" step of IVF expressed as one aggregation: element-wise
    * mean via explode-free array folding would need a UDAF, so this uses
    * posexplode + group, the standard shuffle-bounded shape. */
  def labelCentroids(emb: DataFrame): DataFrame = {
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("mean_x"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_x")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("mean_x")).as("centroid"))
  }

  private val q: Seq[(String, QueryDef)] = Seq(
    "simsearch_topk" -> QueryDef(
      (s: SparkSession, d: String) => bruteForceTopK(s, d, 0L, 10), bruteForceTopKSql),
    "simsearch_lsh" -> QueryDef(
      (s: SparkSession, d: String) => lshTopK(s, d, 0L, 10), None)
  )

  def queries: Seq[(String, QueryDef)] = q
}
