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
      qId: Long, topK: Int): DataFrame =
    pqCodeTable(emb, dim, m, k, iters, qId)
      .filter(col("vec_id") =!= qId)
      .select(col("vec_id").as("neighbor_id"),
        concat_ws("-",
          (0 until m).map(s => col(s"code$s").cast("string")): _*).as("pq_code"),
        (0 until m).map(s => col(s"d$s")).reduce(_ + _).as("approx_d2"))
      .orderBy(col("approx_d2"), col("neighbor_id"))
      .limit(topK)

  /** The trained-and-encoded corpus: one row per vector with its m
    * codeword ids and the query's ADC LUT entry per subspace —
    * (vec_id, code0..m, d0..m). Shared by `pqTopK` and the IVF-PQ
    * composition.
    *
    * Encode is ONE narrow projection over ONE scan: training returns
    * each subspace's final centroid matrix as bounded literal metadata,
    * so every code is an argmin over literals on the corresponding
    * slice of the quantized vector and every LUT distance a literal-map
    * lookup — zero joins, zero exchanges after training. (Re-scoring a
    * slice against the final centroids reproduces the training loop's
    * final assignment exactly: same integer grid, same (d2, cluster)
    * tie-break.) */
  def pqCodeTable(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      qId: Long): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // the m subspace codebooks are independent — train them on
    // concurrent driver threads (Lloyd rounds are collect-driven
    // micro-jobs; the scheduler interleaves them, so wall-clock is the
    // longest single chain instead of the sum of all m)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val codebooks: Seq[Seq[(Int, Seq[Long])]] =
      Await.result(Future.sequence((0 until m).map { s =>
        Future {
          val sub = emb.select(col("vec_id"),
            slice(col("embedding"), s * subDim + 1, subDim).as("embedding"))
          Clustering.trainAssignWithCents(sub, k, iters)._2
        }
      }), Duration.Inf)
    val embInt = emb.select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("v"))
    // the query's full quantized vector: one bounded row on the same
    // integer grid the codebooks live on; sliced driver-side per subspace
    val qv = embInt.filter(col("vec_id") === qId)
      .select(col("v")).collect()(0).getSeq[Long](0)
    // ADC lookup tables: exact integer distance from the query
    // subvector to every codeword — m×k entries, literal metadata
    val luts: Seq[Map[Int, Long]] = codebooks.zipWithIndex.map {
      case (cents, s) =>
        val qsub = qv.slice(s * subDim, (s + 1) * subDim)
        cents.map { case (cid, c) =>
          cid -> c.zip(qsub).map { case (a, b) => (a - b) * (a - b) }.sum
        }.toMap
    }
    val coded = (0 until m).foldLeft(embInt) { (df, s) =>
      df.withColumn(s"code$s", Clustering.bestCluster(
        slice(col("v"), s * subDim + 1, subDim), codebooks(s))
        .getField("cluster"))
    }
    coded.select(col("vec_id") +: (0 until m).flatMap(s => Seq(
      col(s"code$s"),
      element_at(typedlit(luts(s)), col(s"code$s")).as(s"d$s"))): _*)
  }

  /** Unrolled-CTE oracle: the `Clustering.kmeansSql` replay once per
    * subspace (prefixed CTE chains over the sliced vectors), then the
    * LUT join and ADC sum — every centroid, code, and distance
    * re-derived in SQL on the identical integer grid. */
  def pqTopKSql(dim: Int, m: Int, k: Int, iters: Int, qId: Long,
      topK: Int): String = {
    val joins = (1 until m).map(s =>
      s"JOIN s${s}_a$iters a$s USING (vec_id) " +
        s"JOIN s${s}_lut l$s ON a$s.cluster = l$s.cluster").mkString("\n  ")
    val codes = (0 until m).map(s => s"a$s.cluster").mkString(", ")
    s"""WITH ${pqSubspaceCtes(dim, m, k, iters, qId)}
       |SELECT vec_id AS neighbor_id, concat_ws('-', $codes) AS pq_code,
       |       CAST(${pqDistSum(m)} AS BIGINT) AS approx_d2
       |FROM s0_a$iters a0
       |  JOIN s0_lut l0 ON a0.cluster = l0.cluster
       |  $joins
       |WHERE vec_id <> $qId
       |ORDER BY approx_d2, neighbor_id
       |LIMIT $topK""".stripMargin
  }

  /** The ADC sum over the m per-subspace LUT aliases l0..l{m−1}. */
  private def pqDistSum(m: Int): String =
    (0 until m).map(s => s"l$s.d").mkString(" + ")

  /** The m prefixed per-subspace CTE chains (quantized slice → seeded
    * codebook → unrolled Lloyd rounds → query LUT) — the WITH body
    * shared by `pqTopKSql` and `ivfPqTopKSql`. */
  private def pqSubspaceCtes(dim: Int, m: Int, k: Int, iters: Int,
      qId: Long): String = {
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

    (0 until m).map(subspace).mkString(",\n")
  }

  /** IVF-PQ (Jégou et al. 2011 §V, the no-residual IVFPQ variant FAISS
    * calls `by_residual=false`): the coarse IVF quantizer prunes the
    * corpus to the query's `nprobe` nearest cells, and the surviving
    * candidates are scored by PQ ADC instead of exact cosine — the
    * production serving configuration, where the scan reads ~nprobe/
    * cells of the data AND each candidate costs m LUT adds instead of
    * a d-dim dot product. Composes the two oracle-checked halves:
    * `Similarity.ivfAssign`'s exact quantized-sum coarse cells and
    * this module's integer PQ codebooks, so the ENTIRE chain stays
    * behind the DuckDB gate. (Classic IVFPQ trains PQ on cell
    * residuals; raw-vector PQ is the standard simplification and keeps
    * the codebooks corpus-global — one training, any nprobe.) */
  def ivfPqTopK(spark: SparkSession, dir: String, dim: Int, m: Int,
      k: Int, iters: Int, qId: Long, nprobe: Int, topK: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val assigned = Similarity.ivfAssign(emb)
    // probe-cell choice: bounded driver-side metadata, the same
    // (−cosine, cell) order as ivfProbe/ivfTopK
    val qv = emb.filter(col("vec_id") === qId)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val probeCells = Similarity.labelCentroids(emb)
      .select(col("label").as("cell"), col("centroid")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .map { case (c, ctr) =>
        c -> -(dot(qv, ctr) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(ctr, ctr))))
      }.sortBy { case (c, d) => (d, c) }.take(nprobe).map(_._1).toSeq
    val codes = pqCodeTable(emb, dim, m, k, iters, qId)
    assigned
      .filter(col("cell").isin(probeCells: _*) && col("vec_id") =!= qId)
      .select(col("vec_id"), col("cell"))
      .join(codes, Seq("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        (0 until m).map(s => col(s"d$s")).reduce(_ + _).as("approx_d2"))
      .orderBy(col("approx_d2"), col("neighbor_id"))
      .limit(topK)
  }

  /** The IVF lifecycle CTEs (`Similarity.ivfProbeSql`'s coarse half)
    * composed with the PQ subspace chains: cell pruning and ADC scoring
    * both re-derived in SQL. */
  def ivfPqTopKSql(dim: Int, m: Int, k: Int, iters: Int, qId: Long,
      nprobe: Int, topK: Int): String = {
    val joins = (0 until m).map(s =>
      s"JOIN s${s}_a$iters a$s ON a$s.vec_id = a.vec_id " +
        s"JOIN s${s}_lut l$s ON a$s.cluster = l$s.cluster").mkString("\n  ")
    s"""WITH ${Similarity.ivfCoreCtesSql(qId, nprobe)},
       |${pqSubspaceCtes(dim, m, k, iters, qId)}
       |SELECT a.vec_id AS neighbor_id, a.cell,
       |       CAST(${pqDistSum(m)} AS BIGINT) AS approx_d2
       |FROM assigned a
       |  $joins
       |WHERE a.cell IN (SELECT cell FROM probed) AND a.vec_id <> $qId
       |ORDER BY approx_d2, neighbor_id
       |LIMIT $topK""".stripMargin
  }

  /** Scalar (int8) quantization ANN — the SIMPLEST rung of the
    * compression ladder (FAISS's SQ8 shape, next to PQ's codebooks):
    * each dimension is linearly quantized to a byte against its own
    * corpus [min, max] range, and queries score asymmetrically — exact
    * query components against the RECONSTRUCTED corpus components.
    * Per-dim ranges replace trained codebooks: no Lloyd rounds, a
    * dim-sized stats table instead of m×k centroids, and 1 byte/dim
    * storage (4× over float32 here, on the same integer grid as every
    * other vector op so the whole chain is hash-gateable).
    *
    * All-integer: code = ((x−mn)·255) div (mx−mn) and recon =
    * mn + (code·(mx−mn)) div 255 — operands non-negative, so Spark
    * `div` ≡ DuckDB `//` with no sign split; d2 is an exact BIGINT
    * sum. Degenerate dims (mx = mn) code to 0 and reconstruct mn.
    *
    * Scale shape: the stats table is dim-sized metadata (broadcast),
    * the query row is dim-sized (broadcast), and the scan is one
    * narrow pass over the (vec, dim) relation with the d2 sum partial-
    * aggregating on vec_id — no shuffle wider than the candidate
    * scores, final top-k a TakeOrdered. In a deployment the code
    * table persists (encode-once); the declared query runs
    * stats+encode+probe end-to-end so the chain sits behind the gate. */
  def sq8TopK(emb: DataFrame, qId: Long, topK: Int): DataFrame = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        floor(x.cast("double") * Q).cast("long")).as("v"))
    val ex = e.select(col("vec_id"), posexplode(col("v")).as(Seq("j", "x")))
    val stats = ex.groupBy(col("j"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val q = ex.filter(col("vec_id") === qId).select(col("j"), col("x").as("qx"))
    ex.filter(col("vec_id") =!= qId)
      .join(broadcast(stats), Seq("j"))
      .join(broadcast(q), Seq("j"))
      .withColumn("code", when(col("mx") > col("mn"),
        expr("((x - mn) * 255) div (mx - mn)")).otherwise(lit(0L)))
      .withColumn("recon", when(col("mx") > col("mn"),
        col("mn") + expr("(code * (mx - mn)) div 255")).otherwise(col("mn")))
      .withColumn("t", (col("qx") - col("recon")) * (col("qx") - col("recon")))
      .groupBy(col("vec_id"))
      .agg(sum(col("t")).as("sq8_d2"))
      .select(col("vec_id").as("neighbor_id"), col("sq8_d2"))
      .orderBy(col("sq8_d2"), col("neighbor_id"))
      .limit(topK)
  }

  def sq8TopKSql(qId: Long, topK: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * $Q) AS BIGINT)) AS v
       |  FROM embeddings),
       |pd AS (
       |  SELECT vec_id, CAST(i AS INT) AS j, v[CAST(i AS INT)] AS x
       |  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
       |st AS (SELECT j, MIN(x) AS mn, MAX(x) AS mx FROM pd GROUP BY j),
       |q AS (SELECT j, x AS qx FROM pd WHERE vec_id = $qId),
       |c AS (
       |  SELECT pd.vec_id, pd.j,
       |    CASE WHEN st.mx > st.mn
       |         THEN ((pd.x - st.mn) * 255) // (st.mx - st.mn)
       |         ELSE 0 END AS code,
       |    st.mn, st.mx
       |  FROM pd JOIN st USING (j) WHERE pd.vec_id <> $qId),
       |r AS (
       |  SELECT c.vec_id,
       |    q.qx - (CASE WHEN c.mx > c.mn
       |                 THEN c.mn + (c.code * (c.mx - c.mn)) // 255
       |                 ELSE c.mn END) AS diff
       |  FROM c JOIN q USING (j))
       |SELECT vec_id AS neighbor_id, CAST(SUM(diff * diff) AS BIGINT) AS sq8_d2
       |FROM r GROUP BY vec_id
       |ORDER BY sq8_d2, neighbor_id
       |LIMIT $topK""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "simsearch_sq8" -> QueryDef(
      (s, d) => sq8TopK(Tables.embeddings(s, d), qId = 0L, topK = 10),
      sq8TopKSql(qId = 0L, topK = 10)),
    "simsearch_pq" -> QueryDef(
      (s, d) => pqTopK(Tables.embeddings(s, d), dim = 64, m = 4, k = 8,
        iters = 2, qId = 0L, topK = 10),
      pqTopKSql(dim = 64, m = 4, k = 8, iters = 2, qId = 0L, topK = 10)),
    "simsearch_ivfpq" -> QueryDef(
      (s, d) => ivfPqTopK(s, d, dim = 64, m = 4, k = 8, iters = 2,
        qId = 0L, nprobe = 2, topK = 10),
      ivfPqTopKSql(dim = 64, m = 4, k = 8, iters = 2, qId = 0L,
        nprobe = 2, topK = 10)))
}
