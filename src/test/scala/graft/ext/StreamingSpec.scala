package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.streaming.Streams

/** W4/W5 streaming twins: the same transforms must produce the batch
  * answer when driven through MemoryStream + processAllAvailable, and
  * watermark semantics must drop late data (SURVEY.md §2.9). */
case class Vec(vec_id: Long, embedding: Array[Float])

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long,
    event_id: Long)

class StreamingSpec extends SparkSuite {

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val batch = Seq(
    Ev(ts(1), "view", 1.0, 1, 1),
    Ev(ts(4), "view", 2.0, 1, 2),
    Ev(ts(11), "click", 3.0, 2, 3),
    Ev(ts(14), "view", 4.0, 2, 4),
    Ev(ts(25), "view", 5.0, 1, 5))

  test("tumbling window stream == batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("bucket_ts", "event_type").collect().toSeq
      val batched = Streams.tumblingCounts(batch.toDF())
        .orderBy("bucket_ts", "event_type").collect().toSeq
      assert(streamed == batched)
      assert(streamed.map(_.getAs[Long]("n_events")).sum == batch.length)
    } finally q.stop()
  }

  test("OHLC candle stream == the batch ohlcDaily contract, " +
      "incrementally across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two days of trades, fed in two chunks that SPLIT day 1 so the
    // candle must update incrementally (open stays, high/close move)
    def t(d: Int, m: Int) = Timestamp.valueOf(f"2024-01-0$d 10:$m%02d:00")
    val chunk1 = Seq(
      Ev(t(1, 1), "trade", 10.0, 1, 1),
      Ev(t(1, 2), "trade", 99.0, 1, 2))
    val chunk2 = Seq(
      Ev(t(1, 3), "trade", 7.0, 1, 3),  // same day: new low + close
      Ev(t(2, 1), "trade", 5.0, 1, 4))  // next day's candle
    val input = MemoryStream[Ev]
    val q = Streams.ohlcStream(input.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("complete").start()
    try {
      input.addData(chunk1: _*)
      q.processAllAvailable()
      input.addData(chunk2: _*)
      q.processAllAvailable()
      val streamed = spark.table("ohlc_out")
        .orderBy("event_type", "day").collect().toSeq
      val batched = graft.rel.TimeSeries.ohlcDaily((chunk1 ++ chunk2).toDF()
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")))
        .withColumn("volume", col("volume")) // same shape
        .orderBy("event_type", "day").collect().toSeq
      assert(streamed.map(r => (r.getDate(0).toString, r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6), r.getDouble(7))) ===
        batched.map(r => (r.getDate(1).toString, r.getString(0),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))))
      // the split day's candle reflects BOTH chunks
      val day1 = streamed.find(_.getDate(0).toString == "2024-01-01").get
      assert(day1.getDouble(2) === 10.0 && day1.getDouble(3) === 99.0 &&
        day1.getDouble(4) === 7.0 && day1.getDouble(5) === 7.0)
    } finally q.stop()
  }

  test("hopping window stream == batch twin; every event lands twice") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.hoppingCounts(input.toDF())
      .writeStream.format("memory").queryName("hopping_out")
      .outputMode("complete").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("hopping_out")
        .orderBy("bucket_ts", "event_type").collect().toSeq
      val batched = Streams.hoppingCounts(batch.toDF())
        .orderBy("bucket_ts", "event_type").collect().toSeq
      assert(streamed == batched)
      // 10-min length / 5-min slide: each event counted in exactly 2 windows
      assert(streamed.map(_.getAs[Long]("n_events")).sum == 2L * batch.length)
    } finally q.stop()
  }

  test("stateful dedup within watermark drops re-sent event_ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(batch.head, batch(1)) // duplicates of event_id 1,2
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == batch.length)
    } finally q.stop()
  }

  test("stream-stream interval join == batch twin; out-of-window view excluded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = Seq(
      Ev(ts(1), "view", 1.0, 1, 1),   // 19 min before purchase → outside
      Ev(ts(14), "view", 2.0, 1, 2),  // 6 min before → inside
      Ev(ts(18), "view", 3.0, 1, 3),  // 2 min before → inside
      Ev(ts(16), "view", 4.0, 2, 4))  // other user
    val purchases = Seq(
      Ev(ts(20), "purchase", 9.0, 1, 100),
      Ev(ts(40), "purchase", 9.0, 3, 101)) // user with no views
    val vIn = MemoryStream[Ev]
    val pIn = MemoryStream[Ev]
    val q = Streams.purchaseAttribution(vIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      vIn.addData(views: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_out")
        .orderBy("purchase_id", "view_id").collect().toSeq
      val batched = Streams.purchaseAttribution(views.toDF(), purchases.toDF())
        .orderBy("purchase_id", "view_id").collect().toSeq
      assert(streamed == batched)
      assert(streamed.map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id")))
        == Seq((100L, 2L), (100L, 3L)))
    } finally q.stop()
  }

  test("left-outer interval join: unmatched purchase emits with null " +
      "view only after the watermark passes its window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vIn = MemoryStream[Ev]
    val pIn = MemoryStream[Ev]
    val q = Streams.purchaseAttributionOuter(vIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("attrib_outer_out")
      .outputMode("append").start()
    try {
      // user 1 purchases with a qualifying view; user 3 purchases with
      // none — its null row may NOT appear until the view watermark
      // passes (purchase_ts − 10 min … purchase_ts window closed)
      vIn.addData(Ev(ts(14), "view", 1.0, 1, 2))
      pIn.addData(Ev(ts(20), "purchase", 9.0, 1, 100),
        Ev(ts(20), "purchase", 9.0, 3, 101))
      q.processAllAvailable()
      val early = spark.table("attrib_outer_out").collect()
      assert(!early.exists(_.getAs[Long]("purchase_id") == 101L),
        "unmatched purchase emitted before its window could close")
      // advance BOTH watermarks far past the window
      vIn.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "view", 0.0, 9, 500))
      pIn.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "purchase", 0.0, 9, 501))
      q.processAllAvailable()
      // one more batch: outer results flush on the watermark AFTER the
      // one that passed the window end
      vIn.addData(Ev(Timestamp.valueOf("2024-01-01 12:30:00"), "view", 0.0, 9, 502))
      pIn.addData(Ev(Timestamp.valueOf("2024-01-01 12:30:00"), "purchase", 0.0, 9, 503))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer_out")
        .filter(col("purchase_id").isin(100L, 101L)).collect()
      val matched = rows.filter(_.getAs[Long]("purchase_id") == 100L)
      val unmatched = rows.filter(_.getAs[Long]("purchase_id") == 101L)
      assert(matched.length == 1 && matched(0).getAs[Long]("view_id") == 2L)
      assert(unmatched.length == 1 && unmatched(0).isNullAt(
        unmatched(0).fieldIndex("view_id")),
        s"expected one null-view row for purchase 101, got ${rows.toSeq}")
      // batch twin on the same inputs agrees (nulls included)
      val allViews = Seq(Ev(ts(14), "view", 1.0, 1, 2))
      val allBuys = Seq(Ev(ts(20), "purchase", 9.0, 1, 100),
        Ev(ts(20), "purchase", 9.0, 3, 101))
      val batched = Streams.purchaseAttributionOuter(
        allViews.toDF(), allBuys.toDF())
        .select(col("purchase_id"), col("view_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(batched == Set((100L, 2L), (101L, -1L)))
    } finally q.stop()
  }

  test("watermark drops late data: an event behind the watermark cannot " +
      "change a finalized window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append") // append = emit ONLY finalized windows
      .start()
    try {
      // batch 1: two events in the 10:00 window, one at 10:41 to push
      // the watermark to 10:31 — past the 10:00-10:10 window's end
      input.addData(Ev(ts(1), "view", 1.0, 1, 1), Ev(ts(4), "view", 1.0, 1, 2),
        Ev(Timestamp.valueOf("2024-01-01 10:41:00"), "view", 1.0, 1, 3))
      q.processAllAvailable()
      // batch 2: a LATE event for the already-finalized 10:00 window
      input.addData(Ev(ts(2), "view", 9.0, 1, 4))
      q.processAllAvailable()
      // batch 3: advance far enough to close everything still open
      input.addData(Ev(Timestamp.valueOf("2024-01-01 11:30:00"), "view", 1.0, 1, 5))
      q.processAllAvailable()
      val w0 = spark.table("late_out")
        .filter(col("bucket_ts") === Timestamp.valueOf("2024-01-01 10:00:00"))
        .collect()
      // the finalized 10:00 window holds ONLY the two on-time events —
      // the late 9.0-value row was dropped, not merged and not re-emitted
      assert(w0.length == 1, w0.toSeq)
      assert(w0(0).getAs[Long]("n_events") == 2 &&
        w0(0).getAs[Double]("sum_value") == 2.0, w0.toSeq)
    } finally q.stop()
  }

  test("session windows merge events within the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .orderBy("user_id", "session_start").collect()
      // user 1: events at 10:01/10:04/10:25 within 30-min gaps → 1 session
      // user 2: 10:11/10:14 → 1 session
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("n_events")).toSeq == Seq(3L, 2L))
    } finally q.stop()
  }

  test("near-dup E2E through a real file source + foreachBatch sink: " +
      "restart resumes canonical state from the checkpoint") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("neardup_e2e").toFile.getAbsolutePath
    val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(srcDir).mkdirs()
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val other = "spark engines shuffle partitions across executors with hash exchange operators always"
    def writeDocs(file: String, docs: Seq[(Long, String, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$file", "UTF-8")
      docs.foreach { case (id, text, t) =>
        w.println(s"""{"doc_id":$id,"text":"$text","ts":"$t"}""") }
      w.close()
    }
    val schema = "doc_id LONG, text STRING, ts TIMESTAMP"
    def startQuery() = Streams.nearDupFlags(
        spark.readStream.schema(schema).json(srcDir))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      // foreachBatch: the Update-mode sink for file output — each
      // micro-batch appends; the checkpoint's batchId makes the writes
      // restart-safe (at-least-once, deduped below by distinct)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.DupFlag], _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .start()

    // run 1: seed the LSH buckets with the canonicals, then STOP
    writeDocs("b1.json", Seq(
      (1L, base, "2024-01-01 10:01:00"), (3L, other, "2024-01-01 10:01:00")))
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()

    // run 2: a fresh query object on the same checkpoint gets the exact
    // duplicate — attribution only works if the per-bucket canonical
    // state was recovered from the state store, not rebuilt
    writeDocs("b2.json", Seq((5L, base, "2024-01-01 10:02:00")))
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()

    val flags = spark.read.parquet(outDir)
      .select(col("doc_id"), col("band"), col("dup_of")).distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // canonicals from run 1 are unflagged
    assert(flags.filter(f => f._1 == 1L || f._1 == 3L).forall(_._3.isEmpty))
    // the run-2 duplicate is attributed to the run-1 canonical in ALL
    // bands — cross-RESTART, not just cross-batch
    assert(flags.filter(_._1 == 5L).map(_._2).sorted.toSeq ==
      (0 until graft.ext.Dedup.NumBands).toSeq, flags.toSeq)
    assert(flags.filter(_._1 == 5L).forall(_._3 == Some(1L)), flags.toSeq)
  }

  test("streaming near-dup: cross-batch LSH state flags the planted duplicate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val near = "the quick brown fox jumps over the lazy dog and then runs far away home yesterday"
    val other = "spark engines shuffle partitions across executors with hash exchange operators always"

    val input = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.nearDupFlags(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("update").start()
    try {
      // batch 1 seeds the buckets; batch 2 must hit batch-1 state
      input.addData((1L, base, ts(1)), (3L, other, ts(1)))
      q.processAllAvailable()
      input.addData((5L, base, ts(2)), (2L, near, ts(2)))
      q.processAllAvailable()

      val flags = spark.table("neardup_out")
        .select(col("doc_id"), col("dup_of")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      // first arrivals are canonical everywhere
      assert(flags.filter(f => f._1 == 1L || f._1 == 3L).forall(_._2.isEmpty))
      // exact duplicate collides in ALL 4 bands, attributed across batches
      assert(flags.count(_ == ((5L, Some(1L)))) == graft.ext.Dedup.NumBands)
      // a near-dup may or may not collide (LSH is probabilistic), but a
      // flag must never point anywhere except the true canonical
      assert(flags.filter(_._1 == 2L).flatMap(_._2).forall(_ == 1L))
      // unrelated doc is never attributed to another document
      assert(flags.filter(_._1 == 3L).forall(_._2.isEmpty))
    } finally q.stop()
  }

  test("streaming funnel: cross-batch stage advance, pre-stage events ignored") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.FunnelEvent]
    val q = Streams.funnelAdvances(input.toDS(), Streams.FunnelStages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    def fe(uid: Long, m: Int, id: Long, ty: String) =
      Streams.FunnelEvent(uid, ts(m), id, ty)
    try {
      // batch 1: user 1 views; user 2 clicks BEFORE any view (no-op);
      // a second view for user 1 must NOT re-advance
      input.addData(fe(1, 1, 1, "view"), fe(2, 1, 2, "click"),
        fe(1, 2, 3, "view"))
      q.processAllAvailable()
      // batch 2: user 1 completes the chain across the batch boundary;
      // user 2 finally views (stage 1 only)
      input.addData(fe(1, 3, 4, "click"), fe(1, 4, 5, "purchase"),
        fe(2, 3, 6, "view"))
      q.processAllAvailable()
      val adv = spark.table("funnel_out")
        .select("user_id", "stage").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(adv == Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    } finally q.stop()
  }

  test("streaming funnel == batch funnel on the fixture event log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.FunnelEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.FunnelEvent]
    // generous horizon: the batch funnel never expires state
    val q = Streams.funnelAdvances(input.toDS(), Streams.FunnelStages,
        horizonMs = 365L * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("funnel_fixture_out")
      .outputMode("update").start()
    try {
      // three time-ordered micro-batches: state crosses batch boundaries
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("funnel_fixture_out")
        .groupBy("stage").agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batched = graft.rel.EventAnalytics
        .funnel(graft.core.Tables.events(spark, sfDir))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
      assert((1 to 3).forall(k =>
        streamed.getOrElse(k, 0L) == batched(k)),
        s"streamed $streamed != batched $batched")
    } finally q.stop()
  }

  test("streaming funnel: expired state resets and the user re-enters stage 1") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.FunnelEvent]
    val q = Streams.funnelAdvances(input.toDS(), Streams.FunnelStages,
        watermarkDelay = "0 seconds", horizonMs = 60L * 1000)
      .writeStream.format("memory").queryName("funnel_expire_out")
      .outputMode("update").start()
    def at(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    try {
      input.addData(Streams.FunnelEvent(1, at("10:00"), 1, "view"))
      q.processAllAvailable() // watermark → 10:00; timeout at 10:01
      input.addData(Streams.FunnelEvent(2, at("10:10"), 2, "view"))
      q.processAllAvailable() // watermark → 10:10 (timeout not yet seen)
      input.addData(Streams.FunnelEvent(2, at("10:20"), 3, "view"))
      q.processAllAvailable() // user 1 state times out this batch
      // user 1 returns: a click would have been stage 2 — but the funnel
      // expired, so only a fresh view advances (back to stage 1)
      input.addData(Streams.FunnelEvent(1, at("10:21"), 4, "click"),
        Streams.FunnelEvent(1, at("10:22"), 5, "view"))
      q.processAllAvailable()
      val u1 = spark.table("funnel_expire_out")
        .filter(col("user_id") === 1).select("stage").collect()
        .map(_.getInt(0)).toSeq
      assert(u1 == Seq(1, 1), s"expected two fresh stage-1 entries, got $u1")
    } finally q.stop()
  }

  test("streaming transitions == batch transition matrix on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.transitionSteps(input.toDS(),
        horizonMs = 365L * 24 * 3600 * 1000) // batch never expires state
      .writeStream.format("memory").queryName("trans_fixture_out")
      .outputMode("update").start()
    try {
      // state (the per-user last type) must survive batch boundaries
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("trans_fixture_out")
        .groupBy("prev_type", "event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val batched = graft.rel.TimeSeries
        .eventTransitions(graft.core.Tables.events(spark, sfDir))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(streamed === batched, s"streamed $streamed != batched $batched")
    } finally q.stop()
  }

  test("streaming fill-forward == batch densified series on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .as[Streams.TransitionEvent2]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TransitionEvent2]
    val q = Streams.fillForwardStream(input.toDS())
      .writeStream.format("memory").queryName("fill_fixture_out")
      .outputMode("update").start()
    try {
      // split at global DAY boundaries: ts-sorted events keep each day
      // contiguous, so no (user, day) spans a batch and every point is
      // emitted exactly once
      val thirds = ev.length / 3
      def dayOf(e: Streams.TransitionEvent2) =
        Math.floorDiv(e.ts.getTime, 86400000L)
      val cut1 = (thirds until ev.length)
        .find(i => dayOf(ev(i)) != dayOf(ev(i - 1))).getOrElse(ev.length)
      val cut2 = (math.max(cut1, 2 * thirds) until ev.length)
        .find(i => dayOf(ev(i)) != dayOf(ev(i - 1))).getOrElse(ev.length)
      Seq(ev.slice(0, cut1), ev.slice(cut1, cut2), ev.slice(cut2, ev.length))
        .foreach { chunk =>
          if (chunk.nonEmpty) { input.addData(chunk: _*); q.processAllAvailable() }
        }
      val streamed = spark.table("fill_fixture_out")
        .select(col("user_id"), col("day").cast("string"), col("value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val batched = graft.rel.TimeSeries
        .fillForwardDaily(graft.core.Tables.events(spark, sfDir))
        .select(col("user_id"), col("day").cast("string"), col("value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming session paths == batch sessionization on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.sessionPaths(input.toDS())
      .writeStream.format("memory").queryName("paths_fixture_out")
      .outputMode("update").start()
    try {
      // state (open sessions) must survive micro-batch boundaries
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // sentinel events push the watermark far past every open session's
      // gap boundary (first batch advances the watermark, second lets
      // the timeouts fire) so EVERY session closes and is emitted
      val far = ev.map(_.ts.getTime).max + 100L * 24 * 3600 * 1000
      input.addData(Streams.PathEvent(-1L, new Timestamp(far), 1L, "x"))
      q.processAllAvailable()
      input.addData(Streams.PathEvent(-1L, new Timestamp(far + 1000), 2L, "x"))
      q.processAllAvailable()
      val streamed = spark.table("paths_fixture_out")
        .filter(col("user_id") >= 0)
        .select("user_id", "path").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .sessionPathsBatch(graft.core.Tables.events(spark, sfDir))
        .select("user_id", "path").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(streamed === batched)
      // and the aggregated board reproduces the declared top-k query
      val board = streamed.groupBy(_._2).map { case (p, xs) => (p, xs.size.toLong) }
      val topk = graft.rel.EventAnalytics
        .topSessionPaths(graft.core.Tables.events(spark, sfDir), 10)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      topk.foreach { case (p, n) => assert(board(p) === n, s"path $p count") }
    } finally q.stop()
  }

  test("streaming session paths: the gap timeout closes a session with " +
      "no further arrivals from that user") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.sessionPaths(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("paths_timeout_out")
      .outputMode("update").start()
    def at(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    try {
      input.addData(Streams.PathEvent(1, at("10:00"), 1, "view"),
        Streams.PathEvent(1, at("10:05"), 2, "click"))
      q.processAllAvailable() // open session; timeout armed for 10:35
      // only OTHER users' traffic advances the watermark past 10:35
      input.addData(Streams.PathEvent(2, at("10:40"), 3, "view"))
      q.processAllAvailable()
      input.addData(Streams.PathEvent(2, at("10:41"), 4, "view"))
      q.processAllAvailable() // user 1's timeout fires here
      val u1 = spark.table("paths_timeout_out")
        .filter(col("user_id") === 1)
        .select("path", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(u1 === Seq(("view>click", 2L)),
        s"expected the gap timeout to emit the closed session, got $u1")
    } finally q.stop()
  }

  test("streaming session paths: restart resumes the open session from " +
      "the checkpoint") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("paths_e2e").toFile.getAbsolutePath
    val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(srcDir).mkdirs()
    def writeEvents(file: String, evs: Seq[(Long, String, Long, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$file", "UTF-8")
      evs.foreach { case (u, t, id, tp) =>
        w.println(s"""{"user_id":$u,"ts":"$t","event_id":$id,"event_type":"$tp"}""") }
      w.close()
    }
    val schema = "user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING"
    def startQuery() = Streams.sessionPaths(
        spark.readStream.schema(schema).json(srcDir).as[Streams.PathEvent],
        watermarkDelay = "0 seconds")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.SessionPath],
          _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .start()
    // run 1: open a session for user 1, then STOP mid-session
    writeEvents("b1.json", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:05:00", 2L, "click")))
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2 on the same checkpoint: an in-gap event must EXTEND the
    // run-1 session (only possible if (lastTs, path) state was recovered
    // from the state store), then other-user traffic closes it by timeout
    writeEvents("b2.json", Seq(
      (1L, "2024-01-01 10:10:00", 3L, "cart"),
      (2L, "2024-01-01 11:00:00", 4L, "view")))
    writeEvents("b3.json", Seq((2L, "2024-01-01 11:01:00", 5L, "view")))
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    val u1 = spark.read.parquet(outDir)
      .filter(col("user_id") === 1)
      .select("path", "n_events").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(u1 === Seq(("view>click>cart", 3L)),
      s"session must span the restart, got $u1")
  }

  test("streaming transitions: horizon expiry cuts the chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.transitionSteps(input.toDS(),
        watermarkDelay = "0 seconds", horizonMs = 60L * 1000)
      .writeStream.format("memory").queryName("trans_expire_out")
      .outputMode("update").start()
    def at(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    try {
      input.addData(Streams.TransitionEvent(1, 1L, "view", at("10:00")))
      q.processAllAvailable()
      // another user's events push the watermark past user 1's horizon
      input.addData(Streams.TransitionEvent(2, 2L, "view", at("10:10")))
      q.processAllAvailable()
      input.addData(Streams.TransitionEvent(3, 2L, "click", at("10:20")))
      q.processAllAvailable() // user 1 expires here
      // user 1 returns: no cross-horizon view→click transition emitted
      input.addData(Streams.TransitionEvent(4, 1L, "click", at("10:21")))
      q.processAllAvailable()
      val u1 = spark.table("trans_expire_out")
        .filter(col("user_id") === 1).count()
      assert(u1 === 0, "expired chain must not bridge the horizon")
      val u2 = spark.table("trans_expire_out")
        .filter(col("user_id") === 2)
        .select("prev_type", "event_type").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(u2 === Seq(("view", "click")))
    } finally q.stop()
  }

  test("streaming pattern: restart resumes the open view run from the checkpoint") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("pattern_e2e").toFile.getAbsolutePath
    val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(srcDir).mkdirs()
    def writeEvents(file: String, evs: Seq[(Long, Long, String, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$file", "UTF-8")
      evs.foreach { case (id, u, tp, t) =>
        w.println(s"""{"event_id":$id,"user_id":$u,"event_type":"$tp","ts":"$t"}""") }
      w.close()
    }
    val schema = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    def startQuery() = Streams.patternMatches(
        spark.readStream.schema(schema).json(srcDir).as[Streams.TransitionEvent],
        watermarkDelay = "0 seconds")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.PatternMatch],
          _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .start()
    // run 1: two views open a run, then STOP before the click
    writeEvents("b1.json", Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:01:00")))
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    // run 2 on the same checkpoint: the click must close a THREE-view
    // run (n_views = 3, first id = 1) — only possible if the (count,
    // first id) state was recovered from the state store
    writeEvents("b2.json", Seq(
      (3L, 1L, "view", "2024-01-01 10:02:00"),
      (4L, 1L, "click", "2024-01-01 10:03:00")))
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(outDir)
      .select("user_id", "n_views", "first_view_id", "click_event_id")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, 3L, 1L, 4L)),
      s"run must span the restart, got $got")
  }

  test("streaming pattern matches == batch V+ C matching on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.patternMatches(input.toDS())
      .writeStream.format("memory").queryName("pattern_fixture_out")
      .outputMode("update").start()
    try {
      // open view runs must survive micro-batch boundaries
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("pattern_fixture_out")
        .select("user_id", "n_views", "first_view_id", "click_event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .matchViewRunsThenClick(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(streamed === batched)
      assert(batched.nonEmpty, "fixture must exercise the pattern")
    } finally q.stop()
  }

  test("streaming pattern: a run split across micro-batches still matches; " +
      "an interrupting event resets it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tev(id: Long, uid: Long, ty: String, m: Int) =
      Streams.TransitionEvent(id, uid, ty, ts(m))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.patternMatches(input.toDS())
      .writeStream.format("memory").queryName("pattern_split_out")
      .outputMode("update").start()
    try {
      // user 1: views in batch 1, click in batch 2 → one match (2 views)
      // user 2: view, then an error interrupts, then click → no match
      input.addData(tev(1, 1, "view", 1), tev(2, 1, "view", 2),
        tev(3, 2, "view", 1))
      q.processAllAvailable()
      input.addData(tev(4, 1, "click", 3),
        tev(5, 2, "error", 2), tev(6, 2, "click", 3))
      q.processAllAvailable()
      val got = spark.table("pattern_split_out")
        .select("user_id", "n_views", "first_view_id", "click_event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(got === Seq((1L, 2L, 1L, 4L)))
    } finally q.stop()
  }

  test("streaming abandonment: timeout emits the abandoned verdict; " +
      "purchase in bound converts; newer click supersedes silently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tev(id: Long, user: Long, typ: String, m: Int, s: Int = 0) =
      Streams.TransitionEvent(id, user, typ, ts(m, s))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.abandonmentVerdicts(input.toDS(),
        watermarkDelay = "10 minutes", boundMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("abandon_out")
      .outputMode("update").start()
    try {
      input.addData(
        tev(1, 1, "click", 0),                      // no purchase ever
        tev(2, 2, "click", 0), tev(3, 2, "purchase", 5),  // in bound
        tev(4, 3, "click", 0), tev(5, 3, "click", 2),     // 4 superseded
        tev(6, 3, "purchase", 5),                   // converts click 5
        tev(7, 4, "click", 0), tev(8, 4, "purchase", 20), // out of bound
        tev(9, 5, "click", 0), tev(10, 5, "purchase", 0)) // same ts: strict >
      q.processAllAvailable()
      val early = spark.table("abandon_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
        .sorted.toSeq
      // only conversions so far — absence verdicts need the timer
      assert(early === Seq((2L, 2L, false), (3L, 5L, false)))
      // two batches: the first advances the watermark past every
      // click+bound, the next lets the timers fire
      input.addData(tev(100, 99, "noop", 59)); q.processAllAvailable()
      input.addData(tev(101, 99, "noop", 59, 30)); q.processAllAvailable()
      val got = spark.table("abandon_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
        .sorted.toSeq
      assert(got === Seq((1L, 1L, true), (2L, 2L, false), (3L, 5L, false),
        (4L, 7L, true), (5L, 9L, true)))
    } finally q.stop()
  }

  test("streaming DAU/WAU increments aggregate to the batch series") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .as[Streams.SessionInput]
      .collect().sortBy(e => us(e.ts))
    val input = MemoryStream[Streams.SessionInput]
    val q = Streams.activeUserStream(input.toDS())
      .writeStream.format("memory").queryName("active_out")
      .outputMode("update").start()
    try {
      // day-boundary-agnostic chunking: micro-batches split mid-day AND
      // across days, exercising both dedup paths of the two-scalar state
      ev.grouped(math.max(1, ev.length / 5 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val inc = spark.table("active_out")
      def series(kind: String): Map[String, Long] = inc
        .filter(col("kind") === kind)
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val dau = series("dau"); val wau = series("wau")
      val batched = graft.rel.EventAnalytics
        .activeUsers(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      // batch surfaces only days WITH activity; streamed wau also covers
      // trailing windows of quiet days — compare on the batch's days
      val streamedOnBatchDays = batched.map { case (d, _, _) =>
        (d, dau.getOrElse(d, 0L), wau.getOrElse(d, 0L)) }
      assert(streamedOnBatchDays === batched)
    } finally q.stop()
  }

  test("streaming streak summaries converge to the batch gaps-and-islands " +
      "rows across day-splitting micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .as[Streams.SessionInput]
      .collect().sortBy(e => us(e.ts))
    val input = MemoryStream[Streams.SessionInput]
    val q = Streams.streakStream(input.toDS())
      .writeStream.format("memory").queryName("streak_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 7 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // n_active_days is strictly increasing per user, so the max row
      // per user is the final summary — the batch row
      val streamed = spark.table("streak_out")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_active_days"), col("n_streaks"), col("best_streak"),
            col("best_start")), col("n_active_days")).as("s"))
        .select(col("user_id"), col("s.*"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4).toString))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .streaks(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4).toString))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming retention increments aggregate to the batch triangle") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .as[Streams.SessionInput]
      .collect().sortBy(e => us(e.ts))
    val input = MemoryStream[Streams.SessionInput]
    val q = Streams.retentionStream(input.toDS())
      .writeStream.format("memory").queryName("retention_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("retention_out")
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .retention(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming cusum == batch first alarms on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .as[Streams.TransitionEvent2]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.TransitionEvent2]
    val q = Streams.cusumAlarmStream(input.toDS())
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("cusum_out")
        .select(col("user_id"), col("alarm_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batched = graft.rel.TimeSeries
        .cusumAlarms(graft.core.Tables.events(spark, sfDir))
        .filter(col("alarm_event_id").isNotNull)
        .select(col("user_id"), col("alarm_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(batched.nonEmpty, "fixture must trip at least one alarm")
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming abandonment == batch verdicts on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.abandonmentVerdicts(input.toDS())
      .writeStream.format("memory").queryName("abandon_fixture_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // flush every pending timer: one batch to advance the watermark
      // 2 days past the last event, one more for the timers to fire
      val far = new Timestamp(ev.map(_.ts.getTime).max + 2L * 86400000)
      input.addData(Streams.TransitionEvent(-1L, -1L, "noop", far))
      q.processAllAvailable()
      input.addData(Streams.TransitionEvent(-2L, -1L, "noop",
        new Timestamp(far.getTime + 1000)))
      q.processAllAvailable()
      // each user's FINAL episode verdict (max click_ts, then click id —
      // the engine-wide total order) must equal the batch operator's row
      val streamed = spark.table("abandon_fixture_out")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0),
          (us(r.getTimestamp(2)), r.getLong(1), r.getBoolean(3))))
        .groupBy(_._1)
        .map { case (u, vs) =>
          val (_, id, ab) = vs.map(_._2).max
          (u, id, ab)
        }.toSeq.sorted
      val batched = graft.rel.EventAnalytics
        .abandonment(graft.core.Tables.events(spark, sfDir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sorted.toSeq
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming ab-test increments reproduce the batch readout's " +
      "exact counts on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .as[Streams.AbEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.AbEvent]
    val q = Streams.abTestStream(input.toDS())
      .writeStream.format("memory").queryName("ab_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val inc = spark.table("ab_out").collect()
        .map(r => (r.getInt(1), r.getString(2)))
      def n(v: Int, k: String) = inc.count(x => x == ((v, k))).toLong
      val b = graft.rel.EventAnalytics
        .abTest(graft.core.Tables.events(spark, sfDir)).collect()(0)
      assert((n(0, "user"), n(0, "conv"), n(1, "user"), n(1, "conv")) ===
        ((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))),
        "streamed enrolment/conversion counts must equal the batch row")
    } finally q.stop()
  }

  test("streaming funnel latency == batch rows on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.funnelLatencyStream(input.toDS())
      .writeStream.format("memory").queryName("latency_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("latency_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .funnelLatency(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched,
        "each converter emits exactly one latency row, equal to batch")
    } finally q.stop()
  }

  test("streaming growth increments aggregate to the batch ledger") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .as[Streams.SessionInput]
      .collect().sortBy(e => us(e.ts))
    val input = MemoryStream[Streams.SessionInput]
    val q = Streams.growthStream(input.toDS())
      .writeStream.format("memory").queryName("growth_out")
      .outputMode("update").start()
    try {
      // day-boundary-agnostic chunks: both churn observers fire (gap
      // seen by a returning event AND by the watermark timer)
      ev.grouped(math.max(1, ev.length / 6 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val far = new Timestamp(ev.map(_.ts.getTime).max + 3L * 86400000)
      input.addData(Streams.SessionInput(-1L, far)); q.processAllAvailable()
      input.addData(Streams.SessionInput(-2L,
        new Timestamp(far.getTime + 1000))); q.processAllAvailable()
      val batched = graft.rel.EventAnalytics
        .growthAccounting(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => r.getDate(0).toString ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val maxDay = batched.keys.max
      // the batch clamps churn at the corpus' last day; a live stream
      // keeps observing — compare on the batch's observable window
      val streamed = spark.table("growth_out")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getDate(1).toString, r.getString(2)))
        .filter { case (d, k) => k != "churned" || d <= maxDay }
        .groupBy(_._1)
        .map { case (d, vs) =>
          def n(k: String) = vs.count(_._2 == k).toLong
          d -> (n("new"), n("retained"), n("resurrected"), n("churned"))
        }
      assert(streamed.toMap === batched,
        "per-day (new, retained, resurrected, churned) must match batch")
    } finally q.stop()
  }

  test("streaming spike verdicts == batch rateSpikes on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.spikeStream(input.toDS())
      .writeStream.format("memory").queryName("spike_out")
      .outputMode("update").start()
    try {
      // hour-boundary-agnostic chunking: micro-batches split mid-hour
      // AND across hours, exercising both close paths (next-hour event
      // and watermark timer)
      ev.grouped(math.max(1, ev.length / 7 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // flush: push the watermark 2 days past the last event so every
      // open hour timer-closes, then once more for the timers to fire
      val far = new Timestamp(ev.map(_.ts.getTime).max + 2L * 86400000)
      input.addData(Streams.TransitionEvent(-1L, -1L, "noop", far))
      q.processAllAvailable()
      input.addData(Streams.TransitionEvent(-2L, -1L, "noop",
        new Timestamp(far.getTime + 1000)))
      q.processAllAvailable()
      val streamed = spark.table("spike_out")
        .filter(col("event_type") =!= "noop")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics
        .rateSpikes(graft.core.Tables.events(spark, sfDir))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched,
        "every observed hour must emit exactly one verdict, equal to batch")
    } finally q.stop()
  }

  test("streaming forecast errors == batch seasonal/persistence arms " +
      "once every day closes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .as[Streams.TypedValueEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TypedValueEvent]
    val q = Streams.forecastErrorStream(input.toDS())
      .writeStream.format("memory").queryName("fcast_out")
      .outputMode("update").start()
    try {
      // arbitrary chunking: a day may SPAN micro-batches — the open-day
      // accumulator must carry across them
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // one far-future sentinel per type closes each type's last real
      // day (the sentinel's own day stays open and never emits)
      val far = ev.map(_.ts.getTime).max + 100L * 24 * 3600 * 1000
      val types = ev.map(_.event_type).distinct
      input.addData(types.zipWithIndex.map { case (t, i) =>
        Streams.TypedValueEvent(-1L - i, t, new Timestamp(far), 0.0) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("fcast_out").collect()
        .map(r => (r.getString(0),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      val sw = streamed.groupBy(_._1).view.mapValues { rs =>
        (rs.count(_._2.isDefined), rs.flatMap(_._2).sum,
         rs.count(_._3.isDefined), rs.flatMap(_._3).sum) }.toMap
      val batched = graft.rel.TimeSeries
        .forecastEval(graft.core.Tables.events(spark, sfDir))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1).toInt, r.getLong(2), r.getLong(4).toInt, r.getLong(5)))
        .toMap
      assert(sw === batched,
        s"streamed arm totals diverge: streamed=$sw batch=$batched")
    } finally q.stop()
  }

  test("streaming staleness alarms: terminal silence episodes equal the " +
      "batch not-ok set, fresh types never terminal-alarm") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lagMs = 4L * 3600 * 1000 // fixture staleness: 0/1.09/3.92/4.67/7.12 h
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .as[Streams.TypedValueEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TypedValueEvent]
    val q = Streams.freshnessStream(input.toDS(), maxLagMs = lagMs)
      .writeStream.format("memory").queryName("stale_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // sentinel 11 min past the corpus end: watermark lands 1 min past
      // max_ts — ABOVE stale types' timers (last + lag < max), BELOW
      // fresh types' timers (last + lag >= max + 4.7 min on fixture)
      val maxMs = ev.map(_.ts.getTime).max
      input.addData(Streams.TypedValueEvent(-1L, "___wm___",
        new Timestamp(maxMs + 11 * 60 * 1000), 0.0))
      q.processAllAvailable()
      val alarms = spark.table("stale_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val lastByType = ev.groupBy(_.event_type).view.mapValues(rs =>
        rs.map(e => Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
          e.ts.getNanos / 1000).max).toMap
      val terminal = alarms.filter { case (t, us) =>
        lastByType.get(t).contains(us) }.map(_._1).toSet
      val batchStale = graft.rel.Quality
        .freshness(graft.core.Tables.events(spark, sfDir),
          maxLagHours = 4)
        .collect().filter(!_.getBoolean(4)).map(_.getString(0)).toSet
      assert(batchStale.nonEmpty, "fixture must have stale types at 4h")
      assert(terminal === batchStale,
        s"terminal alarms $terminal must equal the batch not-ok set $batchStale")
    } finally q.stop()
  }

  test("streaming pit features == batch feature vectors on the fixture log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .as[Streams.PitEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.PitEvent]
    val q = Streams.pitFeatureStream(input.toDS())
      .writeStream.format("memory").queryName("pit_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4), r.getLong(5))
      val streamed = spark.table("pit_out")
        .collect().map(key).sorted.toSeq
      val batched = graft.rel.AdvancedJoins
        .pitFeatures(graft.core.Tables.events(spark, sfDir))
        .collect().map(key).sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming survival exits aggregate to the batch hazard table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Streams.TransitionEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val horizonUs = ev.map(e => us(e.ts)).max
    val input = MemoryStream[Streams.TransitionEvent]
    val q = Streams.survivalExitStream(input.toDS(), horizonUs)
      .writeStream.format("memory").queryName("survival_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 5 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // two sentinel events far past the horizon (no signup → no state)
      // push the watermark beyond every censor timer so censored exits
      // flush; two batches because timers fire on the trigger AFTER the
      // watermark advances
      val far1 = new Timestamp(horizonUs / 1000L + 3L * 24 * 3600 * 1000)
      val far2 = new Timestamp(far1.getTime + 3600 * 1000)
      input.addData(Streams.TransitionEvent(900001L, 999999L, "view", far1))
      q.processAllAvailable()
      input.addData(Streams.TransitionEvent(900002L, 999999L, "view", far2))
      q.processAllAvailable()
      // rebuild the batch table from the streamed exits: bucket counts +
      // the descending cumulative = survival()'s own final aggregation
      val byBucket = spark.table("survival_out")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_exits"),
          sum(col("converted").cast("long")).as("n_converted"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val streamed = byBucket
        .withColumn("n_at_risk", sum(col("n_exits")).over(w))
        .select(col("bucket"), col("n_at_risk"), col("n_converted"),
          expr("n_converted * 10000L div n_at_risk").as("hazard_bp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics.survival(fixture)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming session spans rebuild the batch concurrency table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.sessionSpans(input.toDS())
      .writeStream.format("memory").queryName("spans_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 5 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // push the watermark past every open session's gap boundary
      val last = ev.map(e => e.ts.getTime).max
      input.addData(Streams.PathEvent(999999L,
        new Timestamp(last + 2L * 3600 * 1000), 900001L, "view"))
      q.processAllAvailable()
      input.addData(Streams.PathEvent(999999L,
        new Timestamp(last + 4L * 3600 * 1000), 900002L, "view"))
      q.processAllAvailable()
      // rebuild concurrency from the streamed spans (sentinel user's
      // spans excluded) with the batch op's own delta/cumulative shape
      val spans = spark.table("spans_out")
        .filter(col("user_id") =!= 999999L)
      val deltas = spans.select(col("start_us").as("t"), lit(1L).as("d"))
        .unionByName(spans.select((col("end_us") + 1).as("t"), lit(-1L).as("d")))
        .groupBy(col("t")).agg(sum(col("d")).as("d"))
      val wT = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val live = deltas.withColumn("live", sum(col("d")).over(wT))
        .select(to_date(timestamp_micros(col("t"))).as("day"),
          col("t"), col("live"))
      val peaks = live.groupBy(col("day")).agg(max(col("live")).as("peak"))
      val streamed = live.join(peaks, Seq("day"))
        .filter(col("live") === col("peak"))
        .groupBy(col("day"), col("peak")).agg(min(col("t")).as("at_us"))
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics.sessionConcurrency(fixture)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming seasonal spikes match the batch anomaly table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.seasonalSpikeStream(input.toDS())
      .writeStream.format("memory").queryName("seasonal_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 6 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val last = ev.map(_.ts.getTime).max
      input.addData(Streams.PathEvent(999999L,
        new Timestamp(last + 3L * 24 * 3600 * 1000), 900001L, "sentinel"))
      q.processAllAvailable()
      input.addData(Streams.PathEvent(999999L,
        new Timestamp(last + 4L * 24 * 3600 * 1000), 900002L, "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("seasonal_out")
        .filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sorted.toSeq
      val batched = graft.rel.EventAnalytics.seasonalSpikes(fixture)
        .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming lateness increments aggregate to the batch audit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fixture = graft.core.Tables.events(spark, sfDir)
    // ingest order IS event_id — feed the log as it was written
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(_.event_id)
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.latenessStream(input.toDS())
      .writeStream.format("memory").queryName("lateness_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("lateness_out")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("late_us") > 0).cast("long")).as("n_late"),
          max(col("late_us")).as("max_late_us"),
          sum(col("late_us")).as("sum_late_us"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      val batched = graft.rel.Quality.latenessAudit(fixture)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming inter-arrival gaps aggregate to the batch profile") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.interarrivalStream(input.toDS())
      .writeStream.format("memory").queryName("gaps_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("gaps_out")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), min(col("gap_us")).as("mn"),
          max(col("gap_us")).as("mx"),
          expr("sum(gap_us) div count(1)").as("mean"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      val batched = graft.rel.Experiments.interarrival(fixture)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming volume monitor matches the batch anomaly table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(e => (us(e.ts), e.event_id))
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.volumeStream(input.toDS())
      .writeStream.format("memory").queryName("volume_out")
      .outputMode("update").start()
    try {
      // a day may span micro-batches — the open-day count must carry
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // far-future sentinel closes the last real day
      val far = ev.map(_.ts.getTime).max + 100L * 24 * 3600 * 1000
      input.addData(Streams.PathEvent(-1L, new Timestamp(far), -1L, "x"))
      q.processAllAvailable()
      val streamed = spark.table("volume_out")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4)))
        .sorted.toSeq
      val batched = graft.rel.Experiments.volumeAnomaly(fixture)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4)))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("streaming user-day firsts rebuild the batch stickiness table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Streams.PathEvent]
      .collect().sortBy(_.event_id)
    val input = MemoryStream[Streams.PathEvent]
    val q = Streams.userDayFirsts(input.toDS())
      .writeStream.format("memory").queryName("firsts_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val firsts = spark.table("firsts_out")
      // exactly-once: the increments ARE the distinct user-day relation
      val streamedSet = firsts.collect()
        .map(r => (r.getLong(0), r.getDate(1).toString)).toSeq
      val batchSet = fixture
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .collect().map(r => (r.getLong(0), r.getDate(1).toString)).toSeq
      assert(streamedSet.sorted === batchSet.sorted)
      // and the stickiness table built from the increments matches the
      // declared batch query end to end
      val viaStream = graft.rel.Experiments.stickiness(
        firsts.select(col("user_id"), col("day").cast("timestamp").as("ts")))
        .collect().map(_.toSeq).toSeq
      val viaBatch = graft.rel.Experiments.stickiness(fixture)
        .collect().map(_.toSeq).toSeq
      assert(viaStream === viaBatch)
    } finally q.stop()
  }

  test("streaming record days match the batch record table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fixture = graft.core.Tables.events(spark, sfDir)
    val ev = fixture
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .as[Streams.TypedValueEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.TypedValueEvent]
    val q = Streams.recordStream(input.toDS())
      .writeStream.format("memory").queryName("records_out")
      .outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val far = ev.map(_.ts.getTime).max + 100L * 24 * 3600 * 1000
      val types = ev.map(_.event_type).distinct
      input.addData(types.zipWithIndex.map { case (t, i) =>
        Streams.TypedValueEvent(-1L - i, t, new Timestamp(far), 0.0) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("records_out").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))
        .sorted.toSeq
      val batched = graft.rel.TimeSeries.recordDays(fixture).collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))
        .sorted.toSeq
      assert(batched.nonEmpty)
      assert(streamed === batched)
    } finally q.stop()
  }

  test("semantic-contamination hits stream == batch twin " +
      "(stream-static broadcast join, stateless append)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // bench ids follow the batch twin's % 50 = 0 convention
    val bench = Seq(Vec(0L, Array(1f, 0f, 0f, 0f)),
      Vec(50L, Array(0f, 1f, 0f, 0f)))
    // arrivals across TWO micro-batches: a near-copy of bench 0, an
    // orthogonal vector, an anti-parallel vector (must not flag), and
    // a near-copy of bench 50 arriving late
    val chunk1 = Seq(Vec(1L, Array(0.99f, 0.1f, 0f, 0f)),
      Vec(2L, Array(0f, 0f, 1f, 0f)))
    val chunk2 = Seq(Vec(3L, Array(0f, -1f, 0f, 0f)),
      Vec(4L, Array(0.05f, 0.98f, 0f, 0f)))
    val input = MemoryStream[Vec]
    val q = Streams.semanticContaminationHitsStream(
        input.toDF(), bench.toDF(), thr = 0.40)
      .writeStream.format("memory").queryName("semcon_out")
      .outputMode("append").start()
    try {
      input.addData(chunk1: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("semcon_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterFirst == Set((1L, 0L)),
        s"first micro-batch must flag only the near-copy: $afterFirst")
      input.addData(chunk2: _*)
      q.processAllAvailable()
      val streamedHits = spark.table("semcon_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin over the SAME corpus: per-doc rollup of these hits
      val all = (bench ++ chunk1 ++ chunk2).toDF()
      val batched = graft.ext.Corpus.semanticContaminationOn(all, thr = 0.40)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val rolled = streamedHits.groupBy(_._1).map { case (id, hs) =>
        (id, hs.size.toLong, hs.map(_._2).min) }.toSeq.sortBy(_._1)
      assert(rolled == batched,
        s"streamed rollup $rolled != batch twin ${batched.toSeq}")
      assert(batched.map(_._1).toSet == Set(1L, 4L))
    } finally q.stop()
  }
}
