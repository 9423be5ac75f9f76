package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark can derive an Encoder (inner classes need outer scope). */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class IdEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Streaming-equals-batch tests: run each streaming pipeline over a
  * MemoryStream fed in multiple micro-batches and check the results match
  * the same transformation applied to the equivalent batch DataFrame
  * (SURVEY §7 item 7: "same logic, same results on bounded input").
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private val events = Seq(
    Ev(ts(0), 1L, "view", 1.0), Ev(ts(5), 1L, "view", 2.0),
    Ev(ts(10), 2L, "purchase", 10.0), Ev(ts(65), 1L, "view", 3.0),
    Ev(ts(70), 2L, "view", 4.0), Ev(ts(130), 1L, "purchase", 20.0))

  test("tumbling hourly: stream (2 micro-batches, complete mode) == batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingHourly(in.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events.take(3)); q.processAllAvailable()
      in.addData(events.drop(3)); q.processAllAvailable()
      val streamed = spark.table("tumb")
        .select("hour_start", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.tumblingHourly(events.toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows: each event lands in two 30m slides") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sliding(in.toDF())
      .writeStream.format("memory").queryName("slid").outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events); q.processAllAvailable()
      val rows = spark.table("slid").collect()
      assert(rows.map(_.getLong(1)).sum == events.size * 2) // Σn == 2×events
    } finally q.stop()
  }

  test("session windows: gap sessionization matches batch session_window") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionStats(in.toDF())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events.take(4)); q.processAllAvailable()
      in.addData(events.drop(4)); q.processAllAvailable()
      val streamed = spark.table("sess").collect().map(_.toSeq).toSet
      val batch = EventStreams.sessionStats(events.toDF()).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // user 1: events at 0,5 | 65 | 130 min → 3 sessions with 30m gap
      assert(streamed.count(_.head == 1L) == 3)
    } finally q.stop()
  }

  test("streaming protocol sink: micro-batches land as Airbyte NDJSON epochs") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val q = EventStreams.startToAirbyteNdjson(in.toDF(), "events", out, ckpt)
    try {
      in.addData(events.take(2)); q.processAllAvailable()
      in.addData(events.drop(2)); q.processAllAvailable()
      val lines = spark.read.text(s"$out/epoch=*").collect().map(_.getString(0))
      assert(lines.length == events.size)
      lines.foreach { l =>
        val n = graft.core.Json.parse(l)
        assert(n.get("type").asText == "RECORD")
        assert(n.at("/record/stream").asText == "events")
      }
    } finally q.stop()
  }

  test("stream-stream interval join: purchase attributed to signup within 1h, state bounded") {
    implicit val sc = spark.sqlContext
    val purchases = MemoryStream[IdEv]
    val signups = MemoryStream[IdEv]
    val joined = EventStreams.purchaseAttribution(purchases.toDF(), signups.toDF())
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      signups.addData(
        IdEv(100L, ts(0), 1L, "signup", 0.0),   // 50 min before purchase → attributed
        IdEv(101L, ts(10), 2L, "signup", 0.0))  // different user
      purchases.addData(IdEv(200L, ts(50), 1L, "purchase", 9.99))
      q.processAllAvailable()
      // advance both watermarks far enough to flush the joined row
      signups.addData(IdEv(102L, ts(400), 3L, "signup", 0.0))
      purchases.addData(IdEv(201L, ts(400), 3L, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr").select("purchase_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((200L, 100L)), s"expected attribution pair in $rows")
      assert(!rows.exists(_._2 == 101L)) // other user's signup never joins
      // batch execution of the same definition agrees
      val batch = EventStreams.purchaseAttribution(
        Seq(IdEv(200L, ts(50), 1L, "purchase", 9.99), IdEv(201L, ts(400), 3L, "purchase", 1.0)).toDF(),
        Seq(IdEv(100L, ts(0), 1L, "signup", 0.0), IdEv(101L, ts(10), 2L, "signup", 0.0),
          IdEv(102L, ts(400), 3L, "signup", 0.0)).toDF())
        .select("purchase_id", "signup_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.subsetOf(batch))
      assert(batch.contains((200L, 100L)))
    } finally q.stop()
  }

  test("streaming dedup: first event per id wins within the watermark") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[IdEv]
    val q = EventStreams.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        IdEv(1L, ts(0), 1L, "view", 1.0),
        IdEv(1L, ts(1), 1L, "view", 1.0), // same-batch duplicate
        IdEv(2L, ts(2), 2L, "view", 2.0))
      q.processAllAvailable()
      in.addData(IdEv(2L, ts(3), 2L, "view", 2.0)) // cross-batch duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().toList
      assert(ids.sorted == List(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("idle-session closer: sessions emitted on event-time timeout, state removed") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.idleSessionCloser(in.toDS())
      .writeStream.format("memory").queryName("idle").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart; user 2: one event
      in.addData(
        EventStreams.UserEvent(1L, ts(0), 1.0),
        EventStreams.UserEvent(1L, ts(5), 2.0),
        EventStreams.UserEvent(2L, ts(10), 10.0))
      q.processAllAvailable()
      assert(spark.table("idle").isEmpty) // nothing idle yet — sessions still open
      // advance event time far past gap+watermark → both sessions time out
      in.addData(EventStreams.UserEvent(3L, ts(300), 0.5))
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(3L, ts(600), 0.5)) // push watermark again
      q.processAllAvailable()
      val rows = spark.table("idle")
        .select("user_id", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"user 1 session missing: $rows")
      assert(rows.contains((2L, 1L, 10.0)), s"user 2 session missing: $rows")
      // in-batch gap split: same user, two bursts separated by > gap in ONE batch
      val in2 = MemoryStream[EventStreams.UserEvent]
      val q2 = EventStreams.idleSessionCloser(in2.toDS())
        .writeStream.format("memory").queryName("idle2").outputMode(OutputMode.Append()).start()
      try {
        in2.addData(
          EventStreams.UserEvent(7L, ts(0), 1.0),
          EventStreams.UserEvent(7L, ts(100), 2.0)) // 100 min later — new session
        q2.processAllAvailable()
        val split = spark.table("idle2").select("user_id", "n_events").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toList
        assert(split == List((7L, 1L))) // first burst closed by in-batch gap
      } finally q2.stop()
    } finally q.stop()
  }

  test("idle-session closer: late within-watermark event must not rewind lastTs") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.idleSessionCloser(in.toDS())
      .writeStream.format("memory").queryName("idle_late").outputMode(OutputMode.Append()).start()
    try {
      in.addData(EventStreams.UserEvent(9L, ts(10), 1.0))
      q.processAllAvailable()
      // late event (5 min earlier, inside the 30-min watermark): must merge
      // backwards — extend start, NOT rewind lastTs / re-arm timeout earlier
      in.addData(EventStreams.UserEvent(9L, ts(5), 2.0))
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(8L, ts(300), 0.1)) // advance event time → timeout
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(8L, ts(600), 0.1))
      q.processAllAvailable()
      val rows = spark.table("idle_late")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .filter(_._1 == 9L)
      assert(rows.length == 1)
      val (_, start, end, n, sum) = rows.head
      assert(start == ts(5).getTime / 1000 && end == ts(10).getTime / 1000,
        s"expected [ts5, ts10] got [$start, $end]")
      assert(n == 2 && sum == 3.0)
    } finally q.stop()
  }

  test("idle-session closer: stray event older than start-gap becomes its own session, no rewind") {
    // watermark (2h) far exceeds the gap (10min): the old merge condition
    // (t - lastTs <= gap, vacuously true for any t < lastTs) would have
    // merged a 50-minute-older stray into the open session and rewound its
    // start across the silence
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.idleSessionCloser(in.toDS(), gapSec = 600, late = "2 hours")
      .writeStream.format("memory").queryName("idle_stray").outputMode(OutputMode.Append()).start()
    try {
      in.addData(EventStreams.UserEvent(9L, ts(60), 1.0))
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(9L, ts(10), 2.0)) // 50 min before start, gap is 10 min
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(8L, ts(300), 0.1)) // advance event time → timeout
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(8L, ts(600), 0.1))
      q.processAllAvailable()
      val rows = spark.table("idle_stray")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(0)))
        .filter(_._5 == 9L).map(t => (t._1, t._2, t._3, t._4)).toSet
      assert(rows == Set(
        (ts(10).getTime / 1000, ts(10).getTime / 1000, 1L, 2.0),  // stray: singleton session
        (ts(60).getTime / 1000, ts(60).getTime / 1000, 1L, 1.0)), // open session untouched
        s"got $rows")
    } finally q.stop()
  }

  test("cursor tracker: per-stream high-water mark advances across batches (S8 dual)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[EventStreams.CursorEvent]
    val q = EventStreams.cursorTracker(in.toDS())
      .writeStream.format("memory").queryName("cur").outputMode(OutputMode.Update()).start()
    try {
      in.addData(EventStreams.CursorEvent("orders", 5), EventStreams.CursorEvent("orders", 9),
        EventStreams.CursorEvent("users", 3))
      q.processAllAvailable()
      in.addData(EventStreams.CursorEvent("orders", 7)) // stale update must not regress
      q.processAllAvailable()
      val last = spark.table("cur").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // final state per stream: orders=9 (not regressed to 7), users=3
      assert(last.contains(("orders", 9L)) && last.contains(("users", 3L)))
      assert(last.filter(_._1 == "orders").forall(_._2 <= 9L))
    } finally q.stop()
  }

  test("funnel tracker: streamed first-stage times across batches == batch firsts") {
    implicit val sc = spark.sqlContext
    import EventStreams.FunnelEvent
    val batch1 = Seq(
      FunnelEvent(1L, 100L, "view"), FunnelEvent(1L, 90L, "view"), // earlier view wins
      FunnelEvent(1L, 120L, "click"),
      FunnelEvent(2L, 200L, "click"), // click BEFORE view: not a funnel
      FunnelEvent(3L, 300L, "view"))
    val batch2 = Seq(
      FunnelEvent(1L, 150L, "purchase"), // completes user 1's funnel cross-batch
      FunnelEvent(2L, 210L, "view"),
      FunnelEvent(3L, 310L, "signup")) // non-funnel type ignored
    val in = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelTracker(in.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode(OutputMode.Update()).start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      // LATEST emission per user is its current funnel state
      val rows = spark.table("funnel").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      val state = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }
      assert(state(1L) == ((90L, 120L, 150L))) // earliest per stage, cross-batch
      assert(state(2L) == ((210L, 200L, 0L))) // click precedes view; no purchase
      assert(state(3L) == ((300L, 0L, 0L))) // signup ignored
      // batch dual: same stage mins from a plain aggregate over all events
      import spark.implicits._
      val all = (batch1 ++ batch2).toDS()
      val firsts = all.groupByKey(_.user_id).mapGroups { (u, evs) =>
        val es = evs.toSeq
        def m(t: String) = es.filter(_.event_type == t).map(_.epoch_s)
          .reduceOption(math.min(_, _)).getOrElse(0L)
        (u, (m("view"), m("click"), m("purchase")))
      }.collect().toMap
      assert(state == firsts, "stream state must equal the batch firsts")
      // funnel count semantics match q_funnel_steps: strict stage ordering
      val full = state.values.count { case (v, c, b) => v > 0 && v < c && c < b }
      assert(full == 1) // only user 1
    } finally q.stop()
  }

  test("funnel tracker: pre-1970 (negative) timestamps are real times, not the absent sentinel") {
    implicit val sc = spark.sqlContext
    import EventStreams.FunnelEvent
    val in = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelTracker(in.toDS())
      .writeStream.format("memory").queryName("funnel_neg").outputMode(OutputMode.Update()).start()
    try {
      // user 9's earliest view is BEFORE the epoch; a later positive view
      // must not displace it, and the unreached stages still emit 0
      in.addData(FunnelEvent(9L, -500L, "view"), FunnelEvent(9L, 50L, "view"),
        FunnelEvent(9L, 80L, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_neg").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(rows(9L) == ((-500L, 80L, 0L)),
        s"negative earliest view must survive the min logic: got ${rows(9L)}")
    } finally q.stop()
  }
}
