package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE coalescing floor (r21, guide §2.2/§2.5): with
    // parallelismFirst (the default) AQE coalesces a shuffle whose
    // total bytes are small to ~1 MB partitions — collapsing
    // compute-dense stages (candidate-pair verification, signature
    // folds) onto one core even though bytes/row vastly understate
    // work/row. Lowering the floor lets such stages keep the
    // cluster's parallelism; at production scale partitions are
    // hundreds of MB and the floor never binds (scale-neutral).
    // Parameterized for A/B runs; the default is the measured knee.
    val minPart = sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "64k")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minPart)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    // ERROR, not WARN (r22): the driver keeps only a bounded tail of the
    // bench output, and the localCheckpoint-unpersist WARN lines (one per
    // released CC round) were crowding the per-query JSON lines out of
    // it. Nothing is timed differently; log volume is the only change.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM/codegen/scheduler once so the first timed query does
    // not absorb session startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // deterministic execution order → comparable per-round JSON.
    // The host is noisy (±50% run-to-run documented in SURVEY §5, with
    // occasional 10x+ co-tenant spikes on single queries): each query
    // runs SPARK_GRAFT_RUNS times (default 3 — the median of 3 rejects
    // one full spike, where a mean or n=2 average absorbs it) and
    // reports the per-query median. Clamped ≥ 1.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    def median(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      if (s0.size % 2 == 1) s0(s0.size / 2)
      else (s0(s0.size / 2 - 1) + s0(s0.size / 2)) / 2.0
    }
    // SPARK_GRAFT_ONLY (comma-separated names): bench a subset — scale
    // runs time just the heavy family (e.g. BENCH_sf3.json) without
    // paying the full suite at 30x data. Driver calls without it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Declarative scale classes (ScaleClasses): above the demo-corpus
    // threshold the demo-pinned configs are auto-excluded (documented
    // Spark-side walls) and listed in the record; an explicit
    // SPARK_GRAFT_ONLY naming always wins. Checked once, untimed.
    val excluded: Seq[String] =
      if (only.isEmpty) ScaleClasses.exclusions(spark, sfDir).keys.toSeq.sorted
      else Nil
    excluded.foreach(n =>
      System.err.println(s"[bench] excluding scale-classed $n above its threshold"))
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .filterNot { case (n, _) => excluded.contains(n) }
    // PASS-MAJOR with a QueryMemo clear per pass: each pass prices the
    // full suite including every shared artifact's one-time build
    // exactly once, charged to its first consumer — deterministically
    // the same query every pass, so per-query medians are stable and
    // the total is an honest pipeline cost. (Query-major order would
    // let the median-of-3 silently discard the build cost: only run 1
    // pays it, runs 2-3 read the memo.)
    var charges = Map.empty[String, String]
    val samples = (1 to runs).map { _ =>
      QueryMemo.clear()
      val pass = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        QueryMemo.setLabel(name)
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            if (!failed.contains(name)) failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        } finally { QueryMemo.setLabel(null); CacheScope.releaseAll() }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
      // identical every pass (deterministic order + clear-per-pass)
      charges = QueryMemo.buildCharges
      pass
    }
    val results = names.map { case (name, _) =>
      name -> median(samples.map(_.apply(name)))
    }
    QueryMemo.clear()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a broken query must not read as a fast one: failures are listed
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // which query's timing carries each shared memo artifact's one-time
    // build (pass-major accounting): readers comparing per-query numbers
    // across rounds must not misattribute the mining cost
    val chargedJson = charges.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":\"$v\"" }.mkString("{", ",", "}")
    val excludedJson = excluded.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Mechanical round-over-round gate (VERDICT r15 item 6 / r16 item
    // 3): locate the previous round's committed PER-QUERY record and
    // emit the CURRENT run's subtotal over the SHARED query set next
    // to the previous record's subtotal over the same set — so "did
    // the standing suite regress" is one JSON field, not subset
    // arithmetic nobody re-derives. New queries never pollute the
    // comparison. Source of truth: the committed BENCH_full.json from
    // the previous round (read HERE, before this run overwrites it —
    // the driver's BENCH_r{N}.json wrappers carry only the truncated
    // stdout summary, no query map); override with SPARK_GRAFT_PREV.
    val sharedJson: String = {
      val prevPath = sys.env.get("SPARK_GRAFT_PREV").orElse(
        Some("BENCH_full.json").filter(p => new java.io.File(p).isFile))
      prevPath.flatMap { p =>
        try {
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          val prev = JsonMethods.parse(
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(p)), "UTF-8"))
          val prevQ = (prev \ "queries") match {
            case JObject(fs) => fs.collect {
              case (k, JDouble(v)) => k -> v
              case (k, JInt(v)) => k -> v.toDouble
            }.toMap
            case _ => Map.empty[String, Double]
          }
          // comparable only at the same corpus: a scale run picking up
          // the committed sf0.1 record would report a phantom N× shift
          val prevSf = (prev \ "sf") match {
            case JString(v) => Some(v)
            case _ => None
          }
          // a crashed query's fast-fail timing must not read as a
          // speedup (nor a prev-round crash as a regression now):
          // exclude failures on EITHER side from the shared set
          val prevFailed = (prev \ "failed") match {
            case JArray(vs) => vs.collect { case JString(v) => v }.toSet
            case _ => Set.empty[String]
          }
          val shared = results.filter { case (k, _) =>
            prevQ.contains(k) && !failed.contains(k) && !prevFailed(k) }
          if (shared.isEmpty || !prevSf.contains(sfDir)) None
          else {
            val cur = shared.map(_._2).sum
            val old = shared.map { case (k, _) => prevQ(k) }.sum
            Some(s"""{"file":"$p","n":${shared.size},""" +
              s""""total":${math.rint(cur * 1000) / 1000},""" +
              s""""prev_total":${math.rint(old * 1000) / 1000}}""")
          }
        } catch {
          // NonFatal only: an OOM/interrupt during the bench must not
          // be silently converted into shared_prev=null
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"shared_prev: failed to parse $p: $e")
            None
        }
      }.getOrElse("null")
    }
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"excluded":$excludedJson,"build_charged_to":$chargedJson,"shared_prev":$sharedJson,"runs":$runs,"sf":"$sfDir"}"""
    // The driver captures only the last ~2 KB of stdout; the per-query map
    // alone is ~2.4 KB. Persist the full record to a committed file and keep
    // the final stdout line under 200 bytes so it always parses. The path
    // is cwd-relative (the driver runs sbt from the repo root); override
    // with SPARK_GRAFT_BENCH_OUT when launching from elsewhere.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val totalR = math.round(total * 1000.0) / 1000.0
    // Per-query JSON lines (r22, additions-only): the driver's
    // round-over-round PERF comparison had no per-query signal (the full
    // map lives only in BENCH_full.json, overwritten each run), so every
    // median is also emitted as one compact stdout line. The total line
    // stays LAST and unchanged — parsers of the final line see exactly
    // the old contract.
    results.foreach { case (k, v) =>
      val vr = math.rint(v * 1000) / 1000
      println(s"""{"metric":"query","name":"$k","sec":$vr}""")
    }
    println(s"""{"metric":"total","value":$totalR,"unit":"sec","n":${results.size},"failed":$failedJson,"runs":$runs,"full":"$outPath"}""")
    spark.stop()
  }
}
