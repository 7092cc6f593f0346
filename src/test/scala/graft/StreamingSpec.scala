package graft

import graft.streaming._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2a #19-22: streaming ingestion end-to-end, windowed counts
  * with watermark, custom-state sessionization, streaming dedup. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private def wrpJson(id: Long, user: Long, evt: String, ts: String,
      value: Double = 1.0, msgType: Int = 4): String =
    s"""{"msg_type":$msgType,"source":"mac:$user","dest":"event:$evt/$id",""" +
      s""""event_id":$id,"user_id":$user,"ts":"$ts","value":$value}"""

  test("#19 ingest end-to-end: parse -> validate -> route -> batched parquet sink") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString

    val routed = EventStream.route(
      EventStream.validate(EventStream.parse(in.toDF())), spark)
    val q = EventStream.batchedSink(routed, out, ckpt)
    try {
      in.addData(
        wrpJson(1, 10, "click", "2024-01-01 00:00:01"),
        wrpJson(2, 11, "purchase", "2024-01-01 00:00:02"),
        wrpJson(3, 12, "error", "2024-01-01 00:00:03"),
        wrpJson(4, 13, "click", "2024-01-01 00:00:04", msgType = 3)) // invalid
      q.processAllAvailable()
    } finally q.stop()

    val written = spark.read.parquet(out)
    // click routes to s_clicks + s_firehose; purchase to s_commerce +
    // s_firehose; error to s_errors + s_firehose; the msg_type=3 event is
    // dropped by validation. Fanout: every event also hits the firehose.
    val byStream = written.groupBy("stream").count().as[(String, Long)]
      .collect().toMap
    assert(byStream == Map("s_clicks" -> 1L, "s_commerce" -> 1L,
      "s_errors" -> 1L, "s_firehose" -> 3L))
    assert(!written.select("event_id").as[Long].collect().contains(4L))
  }

  test("#19 file JSON source: readStream over a directory drives the same pipeline") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src")
    val out = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fckpt").toString
    java.nio.file.Files.write(srcDir.resolve("batch1.json"),
      Seq(
        wrpJson(10, 20, "click", "2024-01-01 01:00:01"),
        wrpJson(11, 21, "error", "2024-01-01 01:00:02"))
        .mkString("\n").getBytes)

    val raw = spark.readStream.text(srcDir.toString)
    val routed = EventStream.route(
      EventStream.validate(EventStream.parse(raw)), spark)
    val q = EventStream.batchedSink(routed, out, ckpt)
    try q.processAllAvailable() finally q.stop()

    val byStream = spark.read.parquet(out).groupBy("stream").count()
      .as[(String, Long)].collect().toMap
    assert(byStream == Map("s_clicks" -> 1L, "s_errors" -> 1L,
      "s_firehose" -> 2L))
  }

  test("#19f checkpoint recovery: restart resumes without duplicating output") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cksrc")
    val out = java.nio.file.Files.createTempDirectory("graft_cksink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckckpt").toString
    def pipeline() = EventStream.batchedSink(
      EventStream.route(EventStream.validate(EventStream.parse(
        spark.readStream.text(srcDir.toString))), spark), out, ckpt)

    java.nio.file.Files.write(srcDir.resolve("b1.json"),
      wrpJson(100, 1, "click", "2024-01-01 00:00:01").getBytes)
    val q1 = pipeline()
    try q1.processAllAvailable() finally q1.stop()

    // second file arrives while the query is DOWN; restart from the
    // same checkpoint must pick it up and must not re-emit batch 0
    java.nio.file.Files.write(srcDir.resolve("b2.json"),
      wrpJson(200, 2, "purchase", "2024-01-01 00:00:02").getBytes)
    val q2 = pipeline()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out)
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    // click → s_clicks + s_firehose (2), purchase → s_commerce +
    // s_firehose (2); any duplication would double these
    assert(rows == Map(100L -> 2L, 200L -> 2L), rows.toString)
  }

  test("#20 windowed counts with watermark emit closed windows") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val counts = EventStream.windowedCounts(
      EventStream.validate(EventStream.parse(in.toDF())))
    val q = counts.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    try {
      in.addData(
        wrpJson(1, 1, "click", "2024-01-01 00:01:00"),
        wrpJson(2, 1, "click", "2024-01-01 00:02:00"),
        wrpJson(3, 2, "view", "2024-01-01 00:03:00"))
      q.processAllAvailable()
      // advance the watermark past the first window (00:00-00:05):
      // event at 00:20 → watermark 00:10 > window end 00:05
      in.addData(wrpJson(4, 3, "click", "2024-01-01 00:20:00"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("wincounts")
      .select(col("event_type"), col("n")).as[(String, Long)].collect().toSet
    assert(rows == Set(("click", 2L), ("view", 1L)))
  }

  test("#21 flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Evt]
    val sessions = EventStream.sessionize(in.toDS(), gapSec = 1800)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def evt(id: Long, user: Long, epochSec: Long) =
      Evt(user, new java.sql.Timestamp(epochSec * 1000), "click", id, 1.0)
    try {
      // user 7: two events 10s apart (one session), then a 2h gap
      in.addData(evt(1, 7, 1000), evt(2, 7, 1010))
      q.processAllAvailable()
      in.addData(evt(3, 7, 9000)) // closes the first session
      q.processAllAvailable()
    } finally q.stop()

    val closed = spark.table("sessions").as[ClosedSession].collect().toSeq
    assert(closed == Seq(ClosedSession(7, 1000, 1010, 2)))
  }

  test("#19c' streaming route with device regex: source OR stripped dest admits") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val routes = Seq(
      ("r_src", ".*", "^mac:1$"),     // admits only user 1's source
      ("r_dest", ".*", "^click/.*")   // admits only click dests (stripped)
    ).toDF("stream", "event_regex", "device_regex")
    val routed = EventStream.routeWithDevice(
      EventStream.validate(EventStream.parse(in.toDF())), routes)
    val q = routed.writeStream.format("memory").queryName("dev_routed")
      .outputMode("append").start()
    try {
      in.addData(
        wrpJson(1, 1, "click", "2024-01-01 00:00:01"), // both routes
        wrpJson(2, 2, "click", "2024-01-01 00:00:02"), // dest-side only
        wrpJson(3, 2, "error", "2024-01-01 00:00:03")) // neither
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dev_routed").select("stream", "event_id")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("r_src", 1L), ("r_dest", 1L), ("r_dest", 2L)))
  }

  test("#12-streaming failover sink redirects failed micro-batches to the alt dir") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val primary = java.nio.file.Files.createTempDirectory("graft_primary").toString
    val alt = java.nio.file.Files.createTempDirectory("graft_alt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fockpt").toString
    val routed = EventStream.route(
      EventStream.validate(EventStream.parse(in.toDF())), spark)
    // transport "fails" whenever the batch carries an error event
    val q = EventStream.failoverSink(routed, primary, alt, ckpt,
      failPrimary = (b, _) => b.filter(col("event_type") === "error").count() > 0)
    try {
      in.addData(wrpJson(1, 1, "click", "2024-01-01 00:00:01"))
      q.processAllAvailable()
      in.addData(wrpJson(2, 2, "error", "2024-01-01 00:00:02"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(primary).select("event_id").as[Long]
      .collect().toSet == Set(1L))
    assert(spark.read.parquet(alt).select("event_id").as[Long]
      .collect().toSet == Set(2L))
  }

  test("#12b-streaming delivery retries: transient failures retry the primary, only exhaustion fails over") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val primary = java.nio.file.Files.createTempDirectory("graft_rprimary").toString
    val alt = java.nio.file.Files.createTempDirectory("graft_ralt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rckpt").toString
    val routed = EventStream.route(
      EventStream.validate(EventStream.parse(in.toDF())), spark)
    // 'view' batches fail twice then succeed (transient); 'error'
    // batches fail every attempt (exhaustion → alt)
    val q = EventStream.failoverSink(routed, primary, alt, ckpt,
      failPrimary = (b, attempt) =>
        (b.filter(col("event_type") === "view").count() > 0 && attempt < 2) ||
          b.filter(col("event_type") === "error").count() > 0,
      maxRetries = 3)
    try {
      in.addData(wrpJson(1, 1, "view", "2024-01-01 00:00:01"))
      q.processAllAvailable()
      in.addData(wrpJson(2, 2, "error", "2024-01-01 00:00:02"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(primary).select("event_id").as[Long]
      .collect().toSet == Set(1L), "transient failure must retry into primary")
    assert(spark.read.parquet(alt).select("event_id").as[Long]
      .collect().toSet == Set(2L), "exhausted retries must fail over")
  }

  test("#12c-streaming replay after an uncommitted alt divert does not double-count") {
    // epoch 1: transport down, batch 0 lands in alt; the checkpoint is
    // then lost (crash before commit). On replay the transport is back:
    // the batch must land in primary AND the stale alt partition must be
    // scrubbed — primary ∪ alt sees the batch exactly once.
    implicit val sql = spark.sqlContext
    val primary = java.nio.file.Files.createTempDirectory("graft_rp2").toString
    val alt = java.nio.file.Files.createTempDirectory("graft_ra2").toString
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft_rc2a").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_rc2b").toString
    def run(ckpt: String, fail: Boolean): Unit = {
      val in = MemoryStream[String]
      val routed = EventStream.route(
        EventStream.validate(EventStream.parse(in.toDF())), spark)
      val q = EventStream.failoverSink(routed, primary, alt, ckpt,
        failPrimary = (_, _) => fail)
      try {
        in.addData(wrpJson(5, 5, "click", "2024-01-01 00:00:05"))
        q.processAllAvailable()
      } finally q.stop()
    }
    run(ckpt1, fail = true)   // diverted to alt
    // click fans out to s_clicks AND s_firehose — 2 rows, one event
    assert(spark.read.parquet(alt).select("event_id").as[Long]
      .collect().toSet == Set(5L))
    // fresh checkpoint = the epoch never committed; same batch replays
    run(ckpt2, fail = false)  // delivered to primary; alt must be scrubbed
    assert(spark.read.parquet(primary).select("event_id").as[Long]
      .collect().toSet == Set(5L))
    val altRows = try spark.read.parquet(alt).count()
      catch { case _: Exception => 0L } // empty dir reads as no parquet
    assert(altRows == 0L, s"stale alt partition survived replay: $altRows rows")
  }

  test("#19e stream-stream interval join enriches events with registrations") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.types.StructType
    val evIn = MemoryStream[String]
    val regIn = MemoryStream[(Long, java.sql.Timestamp)]
    val events = EventStream.validate(EventStream.parse(evIn.toDF()))
    val regs = regIn.toDF().toDF("reg_user_id", "reg_ts")
    val joined = EventStream.enrich(events, regs)
      .select("event_id", "user_id", "reg_ts")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      regIn.addData((1L, ts("2024-01-01 00:30:00")), // 31 min before evt 1 → in window
        (2L, ts("2024-01-01 10:00:00"))) // 10h before evt 2 → outside
      evIn.addData(
        wrpJson(1, 1, "click", "2024-01-01 01:01:00"),
        wrpJson(2, 2, "view", "2024-01-01 20:00:00"))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      regIn.addData((9L, ts("2024-01-02 00:00:00")))
      evIn.addData(wrpJson(9, 9, "click", "2024-01-02 00:00:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched").select("event_id").as[Long]
      .collect().toSet
    assert(rows.contains(1L) && !rows.contains(2L))
  }

  test("JsonWrp batch source decodes typed Wrp and drops corrupt bodies") {
    val raw = Seq(
      """{"msg_type":4,"source":"mac:1","dest":"event:a/1","qos":24}""",
      """{"msg_type":4,"source":"mac:2","dest":"event:b/2"}""",
      """not json at all{{""",
      """{"other":"shape"}""").toDF("value")
    val wrps = graft.sources.JsonWrp.decodeDataset(raw).collect()
    assert(wrps.length == 2)
    assert(wrps.map(_.dest).toSet == Set("event:a/1", "event:b/2"))
    assert(graft.sources.JsonWrp.corruptRecords(raw).count() == 2)
  }

  test("JsonWrp.classify tags every row with the 400-reason ladder in reference order") {
    val rows = Seq(
      wrpJson(1, 1, "click", "2024-01-01 00:00:01"),             // valid
      "",                                                        // empty payload
      "{not json",                                               // decode error
      wrpJson(2, 2, "view", "2024-01-01 00:00:02", msgType = 3), // bad msg_type
      """{"other":"shape"}""")                                   // no msg_type ⇒ bad msg_type
      .toDF("value")
    val got = graft.sources.JsonWrp.classify(rows)
      .select("reject_reason").as[String].collect().sorted.toSeq
    assert(got == Seq("empty_payload", "invalid_format", "invalid_msg_type",
      "invalid_msg_type", "valid"))
  }

  test("#15c streaming session_window closes sessions past the watermark") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val sessions = EventStream.validate(EventStream.parse(in.toDF()))
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").cast("long").as("start_s"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    try {
      in.addData(
        wrpJson(1, 5, "click", "2024-01-01 00:00:00"),
        wrpJson(2, 5, "click", "2024-01-01 00:10:00"), // same session
        wrpJson(3, 6, "view", "2024-01-01 00:05:00"))
      q.processAllAvailable()
      // event far in the future closes all earlier sessions
      in.addData(wrpJson(4, 7, "click", "2024-01-01 12:00:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sw").as[(Long, Long, Long)].collect().toSet
    assert(rows.contains((5L, 1704067200L, 2L))) // one 2-event session
    assert(rows.contains((6L, 1704067500L, 1L)))
  }

  test("#14-streaming batch/stream parity: throttle flags over the events table agree") {
    val streamed = EventStream.throttle(
      Tables.eventsStream(spark, "/root/testdata/sf0.001"),
      perHour = 2)
      .select(col("hour_start").cast("long"), col("user_id"), col("n_in_hour"))
    val q = streamed.writeStream.format("memory").queryName("throttle_parity")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val viaStream = spark.table("throttle_parity")
      .as[(Long, Long, Long)].collect().toSet

    val viaBatch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_in_hour"))
      .filter(col("n_in_hour") >= 2)
      .select(col("window.start").cast("long"), col("user_id"), col("n_in_hour"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaStream == viaBatch)
    assert(viaStream.nonEmpty, "corpus should contain throttled hours")
  }

  test("batch/stream parity: windowed counts over the events table agree") {
    // the same aggregation, once through readStream over the real
    // parquet and once as a batch plan — results must be identical
    val streamed = Tables.eventsStream(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("day_s"),
        col("event_type"), col("n"))
    val q = streamed.writeStream.format("memory").queryName("parity")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val viaStream = spark.table("parity").as[(Long, String, Long)]
      .collect().toSet

    val viaBatch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("day_s"),
        col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaStream == viaBatch)
    assert(viaStream.nonEmpty)
  }

  test("#24-streaming batch/stream parity: queue-depth gauge over the events table agrees") {
    // the live gauge and the batch evt_queue_depth query must agree on
    // every closed stream-hour (closed-form arithmetic vs row_number)
    val streamed = EventStream.queueDepthGauge(
      Tables.eventsStream(spark, "/root/testdata/sf0.001"))
      .select("stream", "hour_epoch", "n_arrivals", "n_batches",
        "max_depth", "sum_depth")
    val q = streamed.writeStream.format("memory").queryName("qdepth_parity")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val viaStream = spark.table("qdepth_parity")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

    val viaBatch = graft.queries.Events
      .evtQueueDepth(spark, "/root/testdata/sf0.001")
      .select("stream", "hour_epoch", "n_arrivals", "n_batches",
        "max_depth", "sum_depth")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(viaStream == viaBatch)
    assert(viaStream.nonEmpty)
  }

  test("#24-streaming queue-depth closed form survives full batch cycles (n > 100)") {
    // corpus hours never reach 100 arrivals, so the sf0.001 parity test
    // leaves the q > 0 branch of the closed form untested: 250 arrivals
    // in one hour = two full 100-deep cycles + a 50 remainder
    implicit val sql = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val gauge = EventStream.queueDepthGauge(in.toDF().toDF("event_type", "ts"))
      .select("stream", "n_arrivals", "n_batches", "max_depth", "sum_depth")
    val q = gauge.writeStream.format("memory").queryName("qdepth_dense")
      .outputMode("append").start()
    try {
      in.addData((0 until 250).map(i =>
        ("dense", ts(f"2024-03-01 08:${i / 60}%02d:${i % 60}%02d"))))
      q.processAllAvailable()
      in.addData(Seq(("zz_flush", ts("2030-01-01 00:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("qdepth_dense").filter(col("stream") === "dense")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // depths cycle 1..100, 1..100, 1..50: sum = 2*5050 + 50*51/2
    assert(got == Set(("dense", 250L, 3L, 100L, 2L * 5050L + 50L * 51L / 2L)),
      s"got $got")
  }

  test("#25-streaming batch/stream parity: slow-consumer drops + chained-window cutoffs agree") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    // corpus hours never exceed 5 arrivals at sf0.001, so the parity
    // runs at capacity 1; a synthetic 3-consecutive-hour burst on its
    // own stream exercises the cutoff (the corpus has no natural run)
    val corpus = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_type", "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val burst = for {
      h <- 0 until 3; i <- 0 until 3
    } yield ("burst", ts(f"2024-02-10 ${10 + h}%02d:0$i:00"))
    val real = corpus ++ burst

    val in = MemoryStream[(String, java.sql.Timestamp)]
    val drops = EventStream.slowConsumerDrops(
      in.toDF().toDF("event_type", "ts"), capacity = 1L)
    val qG = drops
      .select(col("stream"), unix_timestamp(col("window.start")).as("he"),
        col("dropped"))
      .writeStream.format("memory").queryName("sc_gauge")
      .outputMode("append").start()
    val qC = EventStream.slowConsumerCutoffs(drops)
      .writeStream.format("memory").queryName("sc_cutoffs")
      .outputMode("append").start()
    try {
      val (b1, b2) = real.splitAt(real.length / 2)
      in.addData(b1); qG.processAllAvailable(); qC.processAllAvailable()
      in.addData(b2); qG.processAllAvailable(); qC.processAllAvailable()
      // far-future sentinel closes every real window in both queries
      in.addData(Seq(("zz_flush", ts("2030-01-01 00:00:00"))))
      qG.processAllAvailable(); qC.processAllAvailable()
    } finally { qG.stop(); qC.stop() }

    val gauge = spark.table("sc_gauge").filter(col("stream") =!= "zz_flush")
      .as[(String, Long, Long)].collect().toSet
    val cutoffs = spark.table("sc_cutoffs").filter(col("stream") =!= "zz_flush")
      .as[(String, Long)].collect().toSet

    // batch twin at the same capacity, the evt_slow_consumer shape:
    // per-hour rank > capacity, then lag(2) consecutiveness
    val batchDf = real.toSeq.toDF("event_type", "ts")
    val wArr = Window.partitionBy(col("event_type"), col("h")).orderBy("ts")
    val hourly = batchDf
      .withColumn("h", date_trunc("hour", col("ts")))
      .withColumn("arrival", row_number().over(wArr))
      .groupBy(col("event_type").as("stream"),
        unix_timestamp(col("h")).as("he"))
      .agg(sum(when(col("arrival") > 1, 1L).otherwise(0L)).as("dropped"))
      .filter(col("dropped") > 0)
    val wh = Window.partitionBy(col("stream")).orderBy(col("he"))
    val batchGauge = hourly.as[(String, Long, Long)].collect().toSet
    val batchCutoffs = hourly
      .withColumn("prev2", lag(col("he"), 2).over(wh))
      .filter(col("prev2") === col("he") - lit(7200L))
      .select(col("stream"), col("he"))
      .as[(String, Long)].collect().toSet

    assert(gauge == batchGauge)
    assert(cutoffs == batchCutoffs)
    assert(gauge.nonEmpty, "no drop-hours; parity is vacuous")
    assert(cutoffs == Set(("burst", ts("2024-02-10 12:00:00").getTime / 1000)),
      s"burst must cut off at its third hour; got $cutoffs")
  }

  test("#27b-streaming merge-error flags + empty_history agree with the batch query") {
    implicit val sql = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // stateless flags: readStream over the parquet, complete mode
    val flags = EventStream.mergeErrorFlags(Tables.eventsStream(spark, d))
    val qF = flags.writeStream.format("memory").queryName("me_flags")
      .outputMode("complete").start()
    try qF.processAllAvailable() finally qF.stop()
    val streamFlags = spark.table("me_flags").groupBy("event_type")
      .agg(sum("interface_used_read").as("i"),
        sum("missing_disconnect_payload").as("m"),
        sum("error_merging_event").as("e"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // empty_history: per-user first-seen state over an ordered stream
    val evts = Tables.events(spark, d)
      .select("user_id", "ts", "event_type", "event_id", "value")
      .orderBy("ts", "event_id").as[Evt].collect()
    val in = MemoryStream[Evt]
    val qH = EventStream.firstEvents(in.toDS())
      .writeStream.format("memory").queryName("me_firsts")
      .outputMode("append").start()
    try {
      val (b1, b2) = evts.splitAt(evts.length / 2)
      in.addData(b1.toSeq); qH.processAllAvailable()
      in.addData(b2.toSeq); qH.processAllAvailable()
    } finally qH.stop()
    val streamFirsts = spark.table("me_firsts").groupBy("event_type")
      .count().as[(String, Long)].collect().toMap

    val batch = graft.queries.Events.evtMergeErrors(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    batch.foreach { case (tpe, (i, m, e, h)) =>
      assert(streamFlags(tpe) == ((i, m, e)),
        s"$tpe flags: stream ${streamFlags(tpe)} vs batch ${(i, m, e)}")
      assert(streamFirsts.getOrElse(tpe, 0L) == h,
        s"$tpe empty_history: stream ${streamFirsts.get(tpe)} vs batch $h")
    }
    assert(batch.values.map(_._4).sum > 0, "no first events; vacuous")
  }

  test("#22 dropDuplicatesWithinWatermark suppresses redelivery") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val deduped = EventStream.dedup(
      EventStream.validate(EventStream.parse(in.toDF())))
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      in.addData(
        wrpJson(1, 1, "click", "2024-01-01 00:00:01"),
        wrpJson(1, 1, "click", "2024-01-01 00:00:01"), // same-batch dup
        wrpJson(2, 2, "view", "2024-01-01 00:00:02"))
      q.processAllAvailable()
      in.addData(wrpJson(1, 1, "click", "2024-01-01 00:00:03")) // redelivery
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("deduped").select("event_id").as[Long]
      .collect().toSeq.sorted
    assert(ids == Seq(1L, 2L))
  }

  test("#22c chained stateful ops: dedup THEN windowed counts in ONE query") {
    // the at-least-once ingest reality: counts must be over deduped
    // events, and Spark ≥3.4 runs both stateful operators in one
    // append-mode query — no intermediate sink needed
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val deduped = EventStream.dedup(
      EventStream.validate(EventStream.parse(in.toDF())))
    val counts = deduped
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("chained")
      .outputMode("append").start()
    try {
      in.addData(
        wrpJson(1, 1, "click", "2024-01-01 00:00:01"),
        wrpJson(1, 1, "click", "2024-01-01 00:00:01"), // same-batch dup
        wrpJson(2, 2, "click", "2024-01-01 00:00:02"),
        wrpJson(3, 3, "view", "2024-01-01 00:01:00"))
      q.processAllAvailable()
      // redelivery in a later batch must not bump the closed count
      in.addData(wrpJson(1, 1, "click", "2024-01-01 00:00:03"))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      in.addData(wrpJson(9, 9, "click", "2024-01-01 01:00:00"))
      q.processAllAvailable()
      in.addData(wrpJson(10, 10, "click", "2024-01-01 02:00:00"))
      q.processAllAvailable()
    } finally q.stop()

    val first = spark.table("chained")
      .filter(col("win_start") === "2024-01-01 00:00:00")
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(first.get("click").contains(2L),
      s"expected 2 deduped clicks in the first closed window, got $first")
    assert(first.get("view").contains(1L))
  }
}
