package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.Dedup

/** Native SimHash64: determinism, locality, codegen participation. */
class SimHash64Spec extends SparkSuite {

  private def fps(texts: Seq[String]): Seq[Long] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(SimHash64.simhash64(Dedup.tokens(col("text"))).as("fp"), col("id"))
      .orderBy(col("id"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("identical token streams → identical fingerprint; locality holds") {
    val out = fps(Seq(
      "one two three four five six seven eight nine ten",
      "one two three four five six seven eight nine ten",
      "one two three four five six seven eight nine eleven",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    assert(out(0) == out(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(0), out(2)) < ham(out(0), out(3)),
      s"near-dup must be closer than unrelated: ${ham(out(0), out(2))} vs ${ham(out(0), out(3))}")
  }

  test("participates in whole-stage codegen over a real scan") {
    val df = graft.core.Tables.documents(spark, sfDir)
      .select(SimHash64.simhash64(Dedup.tokens(col("text"))).as("fp"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"no codegen:\n$p")
  }

  test("interpreted eval agrees with codegen path") {
    import spark.implicits._
    // force interpreted eval through a local relation (constant folding)
    val local = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(SimHash64.simhash64(col("toks"))).collect()(0).getLong(0)
    // same tokens through the scan-backed codegen path
    val scan = fps(Seq("a b c")).head
    assert(local == scan)
  }
}
