package graft

import graft.operators.{Batching, Dedup, Sessionize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable pipeline operators must match naive single-threaded
  * reference implementations on generated data — partitioning and
  * window mechanics may never change semantics. */
class PipelineOperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  // deterministic pseudo-random event stream: 400 events, 13 users,
  // lumpy inter-arrival gaps so sessions genuinely split
  private def evts: Seq[(Long, Long, Long)] = {
    var t = 1700000000L
    (1 to 400).map { i =>
      t += (i * 2654435761L) % 4000 // gaps 0..~4000s, some > 1800
      (i.toLong, (i * 7919L) % 13, t)
    } // (event_id, user_id, epoch_s)
  }

  test("Sessionize.gapSessions matches a naive per-user scan") {
    val df = evts.toDF("event_id", "user_id", "sec0")
      .withColumn("ts", timestamp_seconds(col("sec0")))
      .repartition(7)
    val got = Sessionize.gapSessions(df, col("user_id"), col("ts"),
        col("event_id"), 1800)
      .select("event_id", "session_idx").as[(Long, Long)]
      .collect().toMap

    // naive: walk each user's events in event_id order
    val naive = evts.groupBy(_._2).flatMap { case (_, es) =>
      var idx = 0L
      var last = Long.MinValue
      es.sortBy(_._1).map { case (id, _, sec) =>
        if (last == Long.MinValue || sec - last > 1800) idx += 1
        last = sec
        id -> idx
      }
    }.toMap
    assert(got == naive)
  }

  test("Batching.assign fills batches densely in order, bounded by size") {
    val df = evts.toDF("event_id", "user_id", "sec0")
      .withColumn("bucket", (col("sec0") / 100000L).cast("long"))
      .repartition(5)
    val rows = Batching.assign(df, col("user_id"), col("bucket"),
        col("event_id"), 7)
      .select("user_id", "bucket", "batch_id", "event_id")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, group) =>
      val byBatch = group.groupBy(_._3)
      val maxBatch = byBatch.keys.max
      // every batch full except possibly the last; ids assigned in order
      byBatch.foreach { case (b, rs) =>
        assert(rs.length <= 7)
        if (b < maxBatch) assert(rs.length == 7, s"batch $b not full")
      }
      val ordered = group.sortBy(_._4).map(_._3).toSeq
      assert(ordered == ordered.sorted, "batch ids must be monotone in event order")
    }
  }

  test("Routing.fanoutWithDevice: device regex admits via source OR stripped dest (filter.go:86)") {
    import graft.operators.Routing
    val events = Seq(
      // (event_id, event_type, source, dest)
      (1L, "click", "mac:aaa", "event:click/1"),
      (2L, "click", "dns:box", "event:click/2"),
      (3L, "error", "mac:bbb", "event:error/3")
    ).toDF("event_id", "event_type", "source", "dest")
    val routes = Seq(
      ("r_all", ".*", ""),            // empty ⇒ match-all
      ("r_star", ".*", ".*"),         // .* ⇒ match-all
      ("r_src", ".*", "^mac:"),       // matches via source only
      ("r_dest", ".*", "^click/"),    // matches via STRIPPED dest only
      ("r_none", ".*", "^zzz$")       // matches neither side
    ).toDF("stream", "event_regex", "device_regex")
    val got = Routing.fanoutWithDevice(events, routes,
        col("event_type"), col("source"), col("dest"))
      .select("stream", "event_id").as[(String, Long)].collect().toSet
    val all = Set(1L, 2L, 3L)
    val expected =
      all.map(("r_all", _)) ++ all.map(("r_star", _)) ++
        Set(("r_src", 1L), ("r_src", 3L)) ++        // mac: sources
        Set(("r_dest", 1L), ("r_dest", 2L))         // "click/…" stripped dests
    assert(got == expected)
  }

  test("Dedup.keepFirst keeps exactly the minimum-order row per key") {
    val df = evts.toDF("event_id", "user_id", "sec0")
      .withColumn("key", col("event_id") % 37)
      .repartition(9)
    val got = Dedup.keepFirst(df, Seq(col("key")), col("event_id"))
      .select("key", "event_id").as[(Long, Long)].collect().toMap
    val naive = evts.map(e => (e._1 % 37, e._1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    assert(got == naive)
  }
}
