package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for Batching.assignTimeOrSize: on seeded
  * random arrival sequences (gap mix of ties, small gaps, and
  * over-limit idles), the window-cascade formulation must agree with
  * the obvious SEQUENTIAL reference fold of queue.go's semantics —
  * batch closes at batchSize or when the next gap exceeds the limit —
  * for every (stream, bucket) independently. This is the same oracle
  * relationship the streaming twin has (BatchFlushParitySpec), but
  * over adversarial random inputs instead of the corpus. */
class BatchAssignPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  /** queue.go's semantics as a sequential fold: returns batch ids
    * (1-based, per stream) aligned with the input order. */
  private def referenceAssign(secs: Seq[Long], batchSize: Int,
      limit: Long): Seq[Long] = {
    val out = Array.fill(secs.length)(0L)
    var batch = 1L; var n = 0; var last = Long.MinValue
    secs.zipWithIndex.foreach { case (sec, i) =>
      if (n > 0 && sec - last > limit) { batch += 1; n = 0 }
      out(i) = batch; n += 1; last = sec
      if (n == batchSize) { batch += 1; n = 0 }
    }
    out.toSeq
  }

  test("an unreachable gap limit degenerates to pure size batching (assign)") {
    import spark.implicits._
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    def ids(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.select($"event_id", $"batch_id").as[(Long, Long)].collect().toMap
    val sized = ids(graft.operators.Batching.assign(df,
      col("event_type"), lit(1), col("event_id"), 25))
    val timed = ids(graft.operators.Batching.assignTimeOrSize(df,
      col("event_type"), lit(1), col("ts"), col("event_id"), 25,
      Long.MaxValue))
    // assign is 0-based, assignTimeOrSize 1-based dense — same partition
    assert(sized.map { case (k, v) => k -> (v + 1) } == timed)
  }

  test("window cascade equals the sequential reference on random arrivals") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val rows = (0 until 3).flatMap { s =>
        var sec = 1000L * (trial + s)
        (0 until 150).map { i =>
          // gap mix: 30% tie (0), 50% small, 20% over-limit idle
          sec += (rng.nextInt(10) match {
            case 0 | 1 | 2 => 0L
            case 3 | 4 | 5 | 6 | 7 => 1L + rng.nextInt(50)
            case _ => 61L + rng.nextInt(200)
          })
          (s"st$s", (s * 1000 + i).toLong, sec)
        }
      }
      val df = rows.toDF("stream", "event_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val got = graft.operators.Batching.assignTimeOrSize(df,
          col("stream"), lit(1), col("ts"), col("event_id"),
          batchSize = 7, timeLimitSec = 60)
        .select($"stream", $"event_id", $"batch_id")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      rows.groupBy(_._1).foreach { case (stream, evs) =>
        val expect = referenceAssign(evs.sortBy(_._2).map(_._3), 7, 60L)
        assert(got(stream) == expect,
          s"trial $trial stream $stream:\n got ${got(stream)}\n exp $expect")
      }
    }
  }
}
