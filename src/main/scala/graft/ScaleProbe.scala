package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc scale probe (SURVEY §5b): times selected operators against an
  * arbitrary data directory — used with synthetic larger-than-testdata
  * tables to confirm the scale-path plans beat their exact twins once N
  * grows. Usage: runMain graft.ScaleProbe <dir> <query> [query ...] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      // "neardup:<bands>:<bits>:<tau>" probes the parameterized LSH
      // operator directly; anything else is a SparkEntry query name
      val n = q.split(":") match {
        case Array("ivf", k) =>
          val v = Tables.embeddings(spark, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("label").as("cluster_by"),
              org.apache.spark.sql.functions.col("embedding")
                .cast("array<double>").as("e"))
            .withColumn("norm", org.apache.spark.sql.functions.sqrt(
              graft.functions.DotProduct.column(
                org.apache.spark.sql.functions.col("e"),
                org.apache.spark.sql.functions.col("e"))))
          graft.operators.Similarity.ivfAnn(v,
            org.apache.spark.sql.functions.col("vec_id") < 5, k.toInt).count()
        case Array("ivf", k, np) =>
          val v = Tables.embeddings(spark, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("label").as("cluster_by"),
              org.apache.spark.sql.functions.col("embedding")
                .cast("array<double>").as("e"))
            .withColumn("norm", org.apache.spark.sql.functions.sqrt(
              graft.functions.DotProduct.column(
                org.apache.spark.sql.functions.col("e"),
                org.apache.spark.sql.functions.col("e"))))
          graft.operators.Similarity.ivfAnn(v,
            org.apache.spark.sql.functions.col("vec_id") < 5, k.toInt,
            nprobe = np.toInt).count()
        case Array("minhash", k, bands, tau) =>
          graft.operators.TextDedup.minhashLshPairs(
            Tables.documents(spark, dir), 3, k.toInt, bands.toInt,
            tau.toDouble).count()
        case Array("simhash", bands, maxH) =>
          graft.operators.TextDedup.simhashPairs(
            Tables.documents(spark, dir), 3, bands.toInt, maxH.toInt).count()
        case Array("jaccard", tau) =>
          graft.operators.TextDedup.ngramJaccardPairs(
            Tables.documents(spark, dir), 3, tau.toDouble).count()
        case Array("neardup", bands, bits, tau) =>
          val v = Tables.embeddings(spark, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding")
                .cast("array<double>").as("e"))
            .withColumn("norm", org.apache.spark.sql.functions.sqrt(
              graft.functions.DotProduct.column(
                org.apache.spark.sql.functions.col("e"),
                org.apache.spark.sql.functions.col("e"))))
          graft.operators.Similarity.lshNearDupPairs(v, 64,
            bands.toInt, bits.toInt, tau.toDouble).count()
        case Array("cc", nodes, edges) =>
          // synthetic random graph (seeded murmur3 endpoints): times the
          // connected-components loop at arbitrary edge scale; a chain
          // fragment keeps the worst-case round count honest
          val n = nodes.toLong
          val e = edges.toLong
          val rand = spark.range(e).selectExpr(
            s"pmod(hash(id, 1), $n) AS u", s"pmod(hash(id, 2), $n) AS v")
          val chain = spark.range(math.min(n / 10, 100000))
            .selectExpr("id AS u", "id + 1 AS v")
          graft.operators.ConnectedComponents.assign(rand.union(chain))
            .select(org.apache.spark.sql.functions.countDistinct(
              org.apache.spark.sql.functions.col("component"))).collect()(0).getLong(0)
        case Array("docstream", total) =>
          // streaming near-dup suppression throughput: rate-micro-batch
          // → synthetic ~30-word docs (deterministic vocab draws, so
          // real bucket collisions occur) → MinHash/LSH verdicts
          // (stateful, per-band-bucket) → noop sink. Prints docs/sec.
          val target = total.toLong
          val rowsPerBatch = 20000L
          val src = spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rowsPerBatch)
            .option("numPartitions", 32).load()
          val docs = src.selectExpr(
            "value AS doc_id",
            """array_join(transform(sequence(1, 30),
              |  i -> concat('w', pmod(value * 31 + i * 7, 5000))), ' ')
              |AS text""".stripMargin.replaceAll("\n", ""))
          val verdicts = graft.streaming.DocStream.nearDupVerdicts(
            docs, n = 3, k = 16, bands = 4, tau = 0.5)
          val ckptPath = java.nio.file.Files
            .createTempDirectory("probe_docstream_ckpt")
          var qq: org.apache.spark.sql.streaming.StreamingQuery = null
          val processed =
            try {
              qq = verdicts.writeStream.format("noop")
                .option("checkpointLocation", ckptPath.toString).start()
              val t1 = System.nanoTime()
              var done = 0L
              while (done < target) {
                Thread.sleep(100)
                if (!qq.isActive)
                  throw qq.exception.getOrElse(new IllegalStateException(
                    "docstream probe query terminated before reaching target"))
                done = Option(qq.lastProgress)
                  .map(p => (p.batchId + 1) * rowsPerBatch).getOrElse(0L)
              }
              qq.stop()
              val secs = (System.nanoTime() - t1) / 1e9
              println(f"[probe] docstream throughput: ${done / secs}%.0f docs/s ($done docs in $secs%.1f s)")
              done
            } finally {
              if (qq != null && qq.isActive) {
                try qq.stop()
                catch { case _: Throwable => () }
              }
              import scala.jdk.CollectionConverters._
              val walk = java.nio.file.Files.walk(ckptPath)
              try
                walk.iterator().asScala.toSeq
                  .sortBy(-_.getNameCount)
                  .foreach(p => java.nio.file.Files.deleteIfExists(p))
              finally walk.close()
            }
          processed
        case Array("stream", total) =>
          // end-to-end streaming throughput: rate-micro-batch → WRP JSON
          // → parse → validate → broadcast route fanout → noop sink.
          // Prints input events/sec over >= `total` rows — the number to
          // hold against the reference service's single-node ingest.
          val target = total.toLong
          val rowsPerBatch = 100000L
          val src = spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rowsPerBatch)
            .option("numPartitions", 32).load()
          val json = src.selectExpr(
            """concat('{"msg_type":4,"source":"mac:', value % 5000,
              |'","dest":"event:', element_at(
              |  array('click','view','purchase','error','heartbeat'),
              |  cast(value % 5 as int) + 1),
              |'/', value, '","event_id":', value,
              |',"user_id":', value % 5000,
              |',"ts":"2024-01-01 00:00:01","value":1.5}')
              |AS value""".stripMargin.replaceAll("\n", ""))
          val routed = graft.streaming.EventStream.route(
            graft.streaming.EventStream.validate(
              graft.streaming.EventStream.parse(json)), spark)
          val ckptPath = java.nio.file.Files
            .createTempDirectory("probe_stream_ckpt")
          var qq: org.apache.spark.sql.streaming.StreamingQuery = null
          val processed =
            try {
              qq = routed.writeStream.format("noop")
                .option("checkpointLocation", ckptPath.toString).start()
              val t1 = System.nanoTime()
              var done = 0L
              // recentProgress is capped (default 100 entries) and would
              // undercount long runs: every rate-micro-batch trigger is
              // exactly rowsPerBatch, so completed batches × batch size
              // is the exact processed count (fresh checkpoint dir ⇒
              // batchId starts at 0)
              while (done < target) {
                Thread.sleep(100)
                if (!qq.isActive)
                  throw qq.exception.getOrElse(new IllegalStateException(
                    "streaming probe query terminated before reaching target"))
                done = Option(qq.lastProgress)
                  .map(p => (p.batchId + 1) * rowsPerBatch).getOrElse(0L)
              }
              qq.stop()
              val secs = (System.nanoTime() - t1) / 1e9
              println(f"[probe] stream throughput: ${done / secs}%.0f events/s ($done rows in $secs%.1f s)")
              done
            } finally {
              // if an exception escaped the poll loop the query may still
              // be running — stop it BEFORE deleting its checkpoint, or
              // the active query races the delete
              if (qq != null && qq.isActive) {
                try qq.stop()
                catch { case _: Throwable => () }
              }
              // the checkpoint is probe-scoped scratch: remove it so
              // repeated probes neither accumulate /tmp state nor risk
              // resuming from a stale batchId
              import scala.jdk.CollectionConverters._
              val walk = java.nio.file.Files.walk(ckptPath)
              try
                walk.iterator().asScala.toSeq
                  .sortBy(-_.getNameCount)
                  .foreach(p => java.nio.file.Files.deleteIfExists(p))
              finally walk.close()
            }
          processed
        case _ => SparkEntry.queries(q)(spark, dir).count()
      }
      println(f"[probe] $q%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
