package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The custom as-of join operator: semantics vs the composed
  * union+window twin, edge cases, and physical-plan shape. */
class AsOfJoinSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches the composed union+window as-of on the events fixture") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val custom = AsOfJoin.asof(buys, views, "user_id", "ts", "v_user", "v_ts")
      .select(col("event_id"), col("user_id"),
        date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
      .collect().toSeq
    // the declared (oracle-checked) composed formulation is the truth
    val composed = graft.SparkEntry.queries("join_asof")(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("asof_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
      .collect().toSeq
    assert(custom.size == composed.size && custom.size > 0)
    assert(custom == composed)
  }

  test("edge cases: no prior match → nulls, ties inclusive, key isolation") {
    import spark.implicits._
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p-before-any"),
      (1L, ts("2024-01-01 12:00:00"), "p-tie"),
      (1L, ts("2024-01-01 13:00:00"), "p-after"),
      (2L, ts("2024-01-01 23:00:00"), "p-other-key"),
      (3L, ts("2024-01-01 09:00:00"), "p-keyless"))
      .toDF("k", "t", "probe")
    val refs = Seq(
      (1L, ts("2024-01-01 11:00:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2-tie"),
      (2L, ts("2024-01-01 08:00:00"), "r3"))
      .toDF("rk", "rt", "ref")
    val out = AsOfJoin.asof(probes, refs, "k", "t", "rk", "rt")
      .select(col("probe"), col("ref"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p-before-any").isEmpty, "no view at-or-before → null")
    assert(out("p-tie").contains("r2-tie"), "equal ts is inclusive, latest wins")
    assert(out("p-after").contains("r2-tie"))
    assert(out("p-other-key").contains("r3"), "keys do not bleed")
    assert(out("p-keyless").isEmpty, "key with no refs → null")
  }

  test("null keys and timestamps never match and never derail the merge") {
    import spark.implicits._
    val probes = Seq(
      (Some(1L), Some(ts("2024-01-01 12:00:00")), "p-ok"),
      (None, Some(ts("2024-01-01 12:00:00")), "p-null-key"),
      (Some(1L), None, "p-null-ts"))
      .toDF("k", "t", "probe")
    val refs = Seq(
      (Some(1L), Some(ts("2024-01-01 11:00:00")), "r1"),
      (None, Some(ts("2024-01-01 10:00:00")), "r-null-key"),
      (Some(1L), None, "r-null-ts"))
      .toDF("rk", "rt", "ref")
    val out = AsOfJoin.asof(probes, refs, "k", "t", "rk", "rt")
      .select(col("probe"), col("ref"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p-ok").contains("r1"), "null ref rows must not block real matches")
    assert(out("p-null-key").isEmpty)
    assert(out("p-null-ts").isEmpty)
  }

  test("physical plan: custom exec, co-partitioned exchanges, no window") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "x")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), "b")).toDF("rk", "rt", "y")
    val df = AsOfJoin.asof(l, r, "k", "t", "rk", "rt")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert("Exchange hashpartitioning\\(k".r.findFirstIn(p).isDefined &&
      "Exchange hashpartitioning\\(rk".r.findFirstIn(p).isDefined,
      s"both sides must co-partition on their key:\n$p")
    assert(!p.contains("Window"), s"no window machinery expected:\n$p")
  }
}
