package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Product quantization ANN (Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the fourth rung of the
  * similarity-search ladder (brute: `simsearch_topk`; sign-bit LSH:
  * `simsearch_lsh`; IVF: `simsearch_ivf`): split the d-dim space into
  * `m` orthogonal subspaces, train a small codebook per subspace
  * (Lloyd's, reusing `Clustering`'s fixed-point integer k-means so the
  * whole training run is bit-identical cross-engine), encode every
  * vector as its m nearest-codeword ids, and answer queries by
  * ASYMMETRIC DISTANCE COMPUTATION: one m×k lookup table of exact
  * integer query-to-codeword distances, summed per candidate.
  *
  * Why this is the 100 TB shape: the corpus compresses to m small ints
  * per vector (m·log2 k bits — here 4 codes ≈ 2 bytes vs 256 bytes of
  * float32), the LUT is bounded driver-side metadata folded in as a
  * literal map, and the scan is a pure narrow map over the code table —
  * zero exchanges after encode, with the final top-k a TakeOrdered.
  * Codebook training cost is bounded: k×subDim metadata per round per
  * subspace, never a driver-side pass over the corpus. In a full
  * system the code table is written once and reused per query; the
  * declared query runs train+encode+probe end-to-end so the ENTIRE
  * chain sits behind the DuckDB gate (the `embedding_kmeans` unrolled
  * -CTE replay, once per subspace).
  *
  * Determinism: codes come from integer argmin with (d2, cluster)
  * tie-break; ADC distances are exact BIGINT sums of products of
  * quantized components — no float path anywhere past the one exact
  * ×2^10 quantization, so ranks are total (ties broken on vec_id) and
  * the oracle compares VALUES, not just ranks.
  */
object Quantization {

  import Clustering.Q

  /** Train m per-subspace codebooks (k codewords, `iters` Lloyd
    * rounds), encode the corpus, and return the ADC top-k for the
    * query vector `qId`: (neighbor_id, pq_code, approx_d2). */
  def pqTopK(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      qId: Long, topK: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // the m subspace codebooks are independent — train them on
    // concurrent driver threads (Lloyd rounds are collect-driven
    // micro-jobs; the scheduler interleaves them, so wall-clock is the
    // longest single chain instead of the sum of all m)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val parts = Await.result(Future.sequence((0 until m).map { s =>
      Future {
        val sub = emb.select(col("vec_id"),
          slice(col("embedding"), s * subDim + 1, subDim).as("embedding"))
        val (assigned, cents) = Clustering.trainAssignWithCents(sub, k, iters)
        // the query's quantized subvector: one bounded row, the same
        // integer grid the codebook lives on
        val qv = assigned.filter(col("vec_id") === qId)
          .select(col("v")).collect()(0).getSeq[Long](0)
        // ADC lookup table for this subspace: exact integer distance from
        // the query subvector to every codeword — k entries, a literal
        val lut: Map[Int, Long] = cents.map { case (cid, c) =>
          cid -> c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.toMap
        assigned.select(col("vec_id"), col("cluster").as(s"code$s"),
          element_at(typedlit(lut), col("cluster")).as(s"d$s"))
      }
    }), Duration.Inf)
    parts.reduce(_.join(_, Seq("vec_id")))
      .filter(col("vec_id") =!= qId)
      .select(col("vec_id").as("neighbor_id"),
        array((0 until m).map(s => col(s"code$s")): _*).as("pq_code"),
        (0 until m).map(s => col(s"d$s")).reduce(_ + _).as("approx_d2"))
      .orderBy(col("approx_d2"), col("neighbor_id"))
      .limit(topK)
  }

  /** Unrolled-CTE oracle: the `Clustering.kmeansSql` replay once per
    * subspace (prefixed CTE chains over the sliced vectors), then the
    * LUT join and ADC sum — every centroid, code, and distance
    * re-derived in SQL on the identical integer grid. */
  def pqTopKSql(dim: Int, m: Int, k: Int, iters: Int, qId: Long,
      topK: Int): String = {
    val subDim = dim / m
    def d2sql(a: String, b: String) =
      s"""list_sum(list_transform(range(1, ${subDim + 1}),
         |      j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))""".stripMargin

    def subspace(s: Int): String = {
      val p = s"s$s"
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      val e =
        s"""${p}_e AS (
           |  SELECT vec_id,
           |    list_transform(list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi),
           |      x -> CAST(floor(x * $Q) AS BIGINT)) AS v
           |  FROM embeddings)""".stripMargin
      val cent0 =
        s"""${p}_c1 AS (
           |  SELECT CAST(vec_id AS INT) AS cluster, v AS cent FROM ${p}_e
           |  WHERE vec_id < $k)""".stripMargin
      def assignCte(i: Int) =
        s"""${p}_a$i AS (
           |  SELECT vec_id, v, cluster FROM (
           |    SELECT e.vec_id, e.v, c.cluster,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${d2sql("e.v", "c.cent")}, c.cluster) AS rn
           |    FROM ${p}_e e CROSS JOIN ${p}_c$i c)
           |  WHERE rn = 1)""".stripMargin
      def updateCte(i: Int) =
        s"""${p}_c${i + 1} AS (
           |  SELECT cluster, list(c ORDER BY pos) AS cent FROM (
           |    SELECT cluster, j.i AS pos, SUM(v[j.i]) // COUNT(*) AS c
           |    FROM ${p}_a$i, (SELECT unnest(range(1, ${subDim + 1})) AS i) j
           |    GROUP BY cluster, j.i)
           |  GROUP BY cluster)""".stripMargin
      val chain =
        if (iters > 1)
          (1 until iters).map(i => assignCte(i) + ",\n" + updateCte(i))
            .mkString(",\n") + ",\n" + assignCte(iters)
        else assignCte(1)
      val lut =
        s"""${p}_lut AS (
           |  SELECT c.cluster,
           |    CAST(${d2sql("q.v", "c.cent")} AS BIGINT) AS d
           |  FROM ${p}_c$iters c,
           |       (SELECT v FROM ${p}_e WHERE vec_id = $qId) q)""".stripMargin
      Seq(e, cent0, chain, lut).mkString(",\n")
    }

    val subs = (0 until m).map(subspace).mkString(",\n")
    val joins = (1 until m).map(s =>
      s"JOIN s${s}_a$iters a$s USING (vec_id) " +
        s"JOIN s${s}_lut l$s ON a$s.cluster = l$s.cluster").mkString("\n  ")
    val codes = (0 until m).map(s => s"a$s.cluster").mkString(", ")
    val dsum = (0 until m).map(s => s"l$s.d").mkString(" + ")
    s"""WITH $subs
       |SELECT vec_id AS neighbor_id, [$codes] AS pq_code,
       |       CAST($dsum AS BIGINT) AS approx_d2
       |FROM s0_a$iters a0
       |  JOIN s0_lut l0 ON a0.cluster = l0.cluster
       |  $joins
       |WHERE vec_id <> $qId
       |ORDER BY approx_d2, neighbor_id
       |LIMIT $topK""".stripMargin
  }

  def queries: Seq[(String, QueryDef)] = Seq(
    "simsearch_pq" -> QueryDef(
      (s, d) => pqTopK(Tables.embeddings(s, d), dim = 64, m = 4, k = 8,
        iters = 2, qId = 0L, topK = 10),
      pqTopKSql(dim = 64, m = 4, k = 8, iters = 2, qId = 0L, topK = 10)))
}
