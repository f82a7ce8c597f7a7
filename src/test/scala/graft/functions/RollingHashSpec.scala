package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native Rabin–Karp k-gram rolling hash: rolling-update equivalence
  * with the direct polynomial sum, Unicode codepoint semantics, edge
  * sizes, codegen participation.
  */
class RollingHashSpec extends SparkSuite {

  import RollingHash.{B, M}

  /** Direct (non-rolling) reference: H_i = Σ cp[i+j]·B^(k−1−j) mod M —
    * the formula the generated oracle SQL states. */
  private def direct(t: String, k: Int): Seq[Long] = {
    val cps = t.codePoints().toArray
    (0 to cps.length - k).map { i =>
      (0 until k).map(j => cps(i + j) * RollingHash.powMod(k - 1 - j) % M)
        .sum % M
    }
  }

  private def native(t: String, k: Int): Seq[Long] = {
    import spark.implicits._
    Seq(t).toDF("t")
      .select(RollingHash.rolling_hash(col("t"), k).as("h"))
      .collect()(0).getSeq[Long](0)
  }

  test("rolling update equals the direct polynomial sum") {
    for (t <- Seq("hello world this is a test string",
                  "the quick brown fox jumps over the lazy dog",
                  "aaaaaaaaaaaaaaaa", "abcdefgh");
         k <- Seq(3, 8)) {
      assert(native(t, k) == direct(t, k), s"t='$t' k=$k")
    }
  }

  test("codepoint semantics: multi-byte chars hash as single units") {
    val t = "ünïcode tëst €42"
    assert(native(t, 8) == direct(t, 8))
    // n = codepoint count, not byte count
    assert(native(t, 8).length == t.codePointCount(0, t.length) - 7)
  }

  test("edge sizes: n < k → empty, n == k → one Horner hash") {
    assert(native("abc", 8).isEmpty)
    assert(native("", 4).isEmpty)
    val one = native("abcdefgh", 8)
    assert(one.length == 1 && one.head ==
      "abcdefgh".foldLeft(0L)((h, c) => (h * B + c) % M))
  }

  test("participates in whole-stage codegen over a real scan") {
    val df = graft.core.Tables.documents(spark, sfDir)
      .select(RollingHash.rolling_hash(col("text"), 8).as("h"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"no codegen:\n$p")
  }
}
