package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting — the measurement companion of
  * [[Explain]] (guide §1: know where the time goes before touching
  * anything). For each named query it runs the bench action (`count()`)
  * under the bench session shape and prints wall seconds, the number of
  * Spark jobs/stages/tasks the query scheduled, and the per-job wall
  * breakdown, so "is this query compute-bound or scheduling-bound" is
  * one read. Usage:
  *   runMain graft.JobProfile [sfDir] [query ...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_RUNS (default 2 —
  * run 1 warms codegen/caches like a bench pass; the LAST run is
  * reported).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("doc_dedup_canon", "doc_bpe", "doc_simhash_md5")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
    sys.env.get("SPARK_GRAFT_MIN_PART").foreach(v =>
      builder.config("spark.sql.adaptive.coalescePartitions.minPartitionSize", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (t0 != 0L) jobs.add((j.jobId, System.nanoTime() - t0))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)

    for (r <- 1 to runs) {
      QueryMemo.clear()
      println(s"\n===== pass $r ${if (r == runs) "(reported)" else "(warm)"} =====")
      names.foreach { n =>
        SparkEntry.queries.get(n) match {
          case Some(fn) =>
            // drain listener state (private bus — settle by sleeping)
            Thread.sleep(300)
            jobs.clear(); stages.set(0); tasks.set(0)
            val t0 = System.nanoTime()
            QueryMemo.setLabel(n)
            try fn(spark, sfDir).count()
            finally { QueryMemo.setLabel(null); CacheScope.releaseAll() }
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300)
            import scala.jdk.CollectionConverters._
            val js = jobs.asScala.toSeq.sortBy(_._1)
            val top = js.sortBy(-_._2).take(8)
              .map { case (id, ns) => f"j$id%d:${ns / 1e9}%.2fs" }
              .mkString(" ")
            println(f"$n%-28s wall=$wall%6.2fs jobs=${js.size}%3d " +
              f"stages=${stages.get()}%3d tasks=${tasks.get()}%5d  top: $top")
          case None => println(s"unknown query '$n'")
        }
      }
    }
    QueryMemo.clear()
    spark.stop()
  }
}
