package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N recall probe for the NSW serving walks (SURVEY §6.2c — the
  * round-15 verdict's "measure greedy/beam recall@10 at 10×/30×"): the
  * fixed 6-plane entry cell (`Similarity.EntryPlanes`) exists precisely
  * for corpora where the adaptive band geometry (3·b up to 30 planes)
  * would make every cell a singleton, but the committed recall pins run
  * only at small N where 3·b = 6 anyway — this probe measures the warm
  * start + walk at the scales the entry-cell design actually targets.
  *
  * Per query (deterministically sampled by md5(vec_id) so replicas and
  * rotation phases are mixed): recall@10 of [[Similarity.graphGreedySearch]]
  * and [[Similarity.graphBeamSearch]] against [[Similarity.bruteForceTopK]].
  * Prints per-query recalls plus the mean/min summary line §6.2c records.
  *
  * Usage: runMain graft.ext.KnnRecallProbe <sfDir> [nQueries] [label]
  * Session geometry matches Bench (SPARK_GRAFT_CPUS, same default).
  */
object KnnRecallProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: KnnRecallProbe <sfDir> [nQueries] [label]")
    val dir = args(0)
    val nQ = if (args.length > 1) args(1).toInt else 20
    val label = if (args.length > 2) args(2) else dir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val n = emb.count()
    val bits = Similarity.knnBandBits(n)
    // standing graph built once (memoized); the probe times nothing —
    // it measures ANSWER QUALITY, the one §6.2c column walls can't give
    Similarity.ensureKnnGraph(spark, dir)
    val qIds = emb.select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nQ).collect().map(_.getLong(0)).sorted
    val results = qIds.map { q =>
      val exact = Similarity.bruteForceTopK(spark, dir, q, 10)
        .collect().map(_.getLong(0)).toSet
      val greedy = Similarity.graphGreedySearch(spark, dir, q, 10)
        .collect().map(_.getLong(1)).count(exact.contains)
      val beam = Similarity.graphBeamSearch(spark, dir, q, 10)
        .collect().map(_.getLong(1)).count(exact.contains)
      println(f"query $q%9d: greedy=$greedy%2d/10 beam=$beam%2d/10")
      (greedy, beam)
    }
    val (gs, bs) = (results.map(_._1), results.map(_._2))
    println(f"knn_recall $label: n=$n b=$bits (entry planes " +
      f"${Similarity.EntryPlanes}) queries=$nQ " +
      f"greedy mean=${gs.sum / 10.0 / nQ}%.3f min=${gs.min}/10 " +
      f"beam mean=${bs.sum / 10.0 / nQ}%.3f min=${bs.min}/10")
    spark.stop()
  }
}
