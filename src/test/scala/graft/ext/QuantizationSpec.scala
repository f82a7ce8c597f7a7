package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization (ext/Quantization): ADC optimality for a
  * planted duplicate, code validity, and partitioning invariance. */
class QuantizationSpec extends SparkSuite {
  import spark.implicits._

  private def fixtureEmb = graft.core.Tables.embeddings(spark, sfDir)

  test("planted exact duplicate of the query ranks first") {
    // a copy of vec 0 gets vec 0's codes in every subspace, and those
    // codes minimize each subspace's query-to-codeword LUT term — so
    // its ADC distance is the global minimum (Jégou et al. §III.B)
    val q = fixtureEmb.filter(col("vec_id") === 0L)
      .collect()(0).getSeq[Float](1)
    val planted = fixtureEmb.select(col("vec_id"), col("embedding"))
      .union(Seq((100000L, q)).toDF("vec_id", "embedding"))
    val top = Quantization.pqTopK(planted, dim = 64, m = 4, k = 8,
      iters = 2, qId = 0L, topK = 5).collect()
    assert(top.head.getLong(0) == 100000L, top.map(_.getLong(0)).toSeq)
    // ADC distance to the duplicate = the query's own quantization
    // distortion, which its per-subspace argmin codes minimize
    assert(top.head.getLong(2) <= top(1).getLong(2))
  }

  test("codes are m ints within [0, k); distances are non-negative") {
    val got = Quantization.pqTopK(fixtureEmb, dim = 64, m = 4, k = 8,
      iters = 2, qId = 0L, topK = 10).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val codes = r.getString(1).split("-").map(_.toInt).toSeq
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 8))
      assert(r.getLong(2) >= 0L)
    }
  }

  test("ivf-pq equals the global ADC ranking restricted to probed cells") {
    val emb = fixtureEmb
    // re-derive the probe-cell choice independently (same (−cos, cell)
    // contract as ivfProbe)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val probe = Similarity.labelCentroids(emb)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
      .map { case (c, ctr) =>
        c -> -(dot(qv, ctr) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(ctr, ctr))))
      }.sortBy { case (c, d) => (d, c) }.take(2).map(_._1).toSet

    val got = Quantization.ivfPqTopK(spark, sfDir, dim = 64, m = 4, k = 8,
      iters = 2, qId = 0L, nprobe = 2, topK = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got.map(_._2).forall(probe.contains), s"cells outside probe set: $got")

    val cells = Similarity.ivfAssign(emb).select(col("vec_id"), col("cell"))
    val expected = Quantization.pqTopK(emb, dim = 64, m = 4, k = 8,
      iters = 2, qId = 0L, topK = Int.MaxValue)
      .join(cells, col("neighbor_id") === col("vec_id"))
      .filter(col("cell").isin(probe.toSeq: _*))
      .orderBy(col("approx_d2"), col("neighbor_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got.map(r => (r._1, r._3)) == expected)
  }

  test("result is invariant to input partitioning") {
    def run(parts: Int) = Quantization.pqTopK(
      fixtureEmb.repartition(parts), dim = 64, m = 4, k = 8,
      iters = 2, qId = 0L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(run(1) == run(13))
  }

  test("sq8: planted duplicate attains the minimal (distortion-only) distance") {
    // a copy of the query quantizes to the query's own codes, so its
    // asymmetric distance is exactly the query's reconstruction
    // distortion — the global minimum of the SQ8 objective
    val q = fixtureEmb.filter(col("vec_id") === 0L)
      .collect()(0).getSeq[Float](1)
    val planted = fixtureEmb.select(col("vec_id"), col("embedding"))
      .union(Seq((100000L, q)).toDF("vec_id", "embedding"))
    val top = Quantization.sq8TopK(planted, qId = 0L, topK = 5).collect()
    assert(top.head.getLong(0) == 100000L, top.map(_.getLong(0)).toSeq)
    assert(top.head.getLong(1) <= top(1).getLong(1))
  }

  test("sq8: per-component reconstruction error is within one quantization step") {
    // |x − recon(x)| ≤ ceil(range/255) for every component: recompute
    // codes/recon driver-side from the same grid ints and audit
    val grid = fixtureEmb.limit(200)
      .select(col("vec_id"), transform(col("embedding"), x =>
        floor(x.cast("double") * Clustering.Q).cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val dims = grid.head._2.indices
    val mn = dims.map(j => grid.map(_._2(j)).min)
    val mx = dims.map(j => grid.map(_._2(j)).max)
    grid.foreach { case (_, v) =>
      dims.foreach { j =>
        val range = mx(j) - mn(j)
        val recon = if (range == 0) mn(j)
          else mn(j) + (((v(j) - mn(j)) * 255) / range) * range / 255
        assert(math.abs(v(j) - recon) <= range / 255 + 1,
          s"dim $j: x=${v(j)} recon=$recon range=$range")
      }
    }
  }

  test("sq8: result is invariant to input partitioning") {
    def run(parts: Int) = Quantization.sq8TopK(
      fixtureEmb.repartition(parts), qId = 0L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) == run(13))
  }
}
