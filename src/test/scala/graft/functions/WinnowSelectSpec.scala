package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.Dedup

/** Native winnowing selection: differential against the reference HOF
  * formulation it replaced, tie/edge semantics, codegen participation.
  */
class WinnowSelectSpec extends SparkSuite {

  /** The original O(n·w) HOF formulation (slice + array_min +
    * array_position per window start) — kept here as the executable
    * reference semantics for the native O(n) deque. */
  private def hofWinnow(h: org.apache.spark.sql.Column, w: Int) =
    when(size(h) >= w,
      array_distinct(transform(
        sequence(lit(1), size(h) - (w - 1)),
        st => Dedup.bind(slice(h, st, lit(w))) { win =>
          (st + array_position(win, array_min(win)) - 1).cast("int")
        })))
      .otherwise(array().cast("array<int>"))

  private def native(hashes: Seq[Long], w: Int): Seq[Int] = {
    import spark.implicits._
    Seq(hashes).toDF("h")
      .select(WinnowSelect.winnow_select(col("h"), w).as("sel"))
      .collect()(0).getSeq[Int](0)
  }

  test("matches the HOF formulation on the real corpus rolling hashes") {
    val k = 8; val w = 16
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val hashes = Dedup.bind(norm) { t =>
      when(length(t) >= k,
        transform(sequence(lit(1), length(t) - (k - 1)),
          i => conv(substring(md5(t.substr(i, lit(k))), 1, 8), 16, 10)
            .cast("long")))
        .otherwise(array().cast("array<bigint>"))
    }
    val both = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), hashes.as("h"))
      .select(col("doc_id"),
        WinnowSelect.winnow_select(col("h"), w).as("fast"),
        hofWinnow(col("h"), w).as("ref"))
    assert(both.filter(not(col("fast") === col("ref"))).count() == 0L)
  }

  test("tie semantics: leftmost minimum wins; repeats dedup to one row") {
    // window w=3 over [5,1,1,9]: windows pick pos2 (leftmost of the two
    // 1s) then pos2 again → distinct [2]
    assert(native(Seq(5L, 1L, 1L, 9L), 3) == Seq(2))
    // all-equal array: each window's leftmost min is its own start
    // (the previous pick expires, per the per-window contract)
    assert(native(Seq(7L, 7L, 7L, 7L), 2) == Seq(1, 2, 3))
    // strictly decreasing: every window picks its last element
    assert(native(Seq(9L, 8L, 7L, 6L), 2) == Seq(2, 3, 4))
  }

  test("edge sizes: n < w → empty, n == w → single global min") {
    assert(native(Seq(3L, 2L), 3).isEmpty)
    assert(native(Seq.empty[Long], 4).isEmpty)
    assert(native(Seq(3L, 1L, 2L), 3) == Seq(2))
  }

  test("participates in whole-stage codegen over a real scan") {
    val df = graft.core.Tables.documents(spark, sfDir)
      .select(WinnowSelect.winnow_select(
        transform(sequence(lit(1), least(length(col("text")), lit(40))),
          i => i.cast("long") * 37L % 11L), 4).as("sel"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"no codegen:\n$p")
  }
}
