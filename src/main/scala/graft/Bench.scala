package graft

import graft.core.Tables
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Each query is materialized through the `noop` sink — `count()` would let
  * Catalyst prune every projection and aggregate down to a row count,
  * benchmarking a different (much cheaper) plan than the one Verify checks.
  * The noop sink executes the full physical plan and discards rows at the
  * writer, so timings reflect real operator cost with zero driver collect.
  *
  * Beyond the query map, two reference workloads from BASELINE.md are
  * timed so the numbers are directly comparable:
  *  - `sample_loading`: CSV read with inferSchema + size estimate + 10%
  *    sample (the reference's most expensive published phase, 22.9–42.6 s
  *    on its cluster; `performance_py/2-cores-6-instances.py:78-104`). The
  *    CSV itself is derived from the parquet fixture once, untimed.
  *  - `ml_fit_*`: fit + 5-metric evaluation for LinearRegression /
  *    DecisionTree / RandomForest on the shared cached feature frame
  *    (BASELINE.md model rows: 53.5 / 38.7 / 35.9 s @100 MB).
  *
  * Round-11: a [[BenchCalibration]] probe runs BEFORE the suite. When it
  * reads degraded (> 1.5× the committed quiet-host reference — the
  * signature that silently inflated the round-10 driver artifact 2–6.5×
  * on untouched code paths), the whole suite re-runs ONCE and the second
  * pass is reported; both JSON lines always carry `calibration_ratio`,
  * `host_degraded` and `suite_rerun` so a contended capture can never
  * again be read at face value.
  */
object Bench {

  /** One full suite pass: every gate query (with verdict gates benched
    * via their raw probes), the reference sample-loading phase, and the
    * three reference ML fits, plus the sf1 headline leg when available.
    */
  private final case class SuiteRun(
      results: Seq[(String, Double)],
      sf1Results: Seq[(String, Double)],
      failed: Seq[String],
      queryCpu: Seq[(String, Double)],
      cpuPct: Double)

  private def runSuite(spark: SparkSession, sfDir: String,
                       only: Option[Set[String]]): SuiteRun = {
    // X2 (ref wraps every query in psutil.cpu_percent spans): process-CPU
    // time around the suite via the JVM's OS bean
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val cpuT0 = osBean.getProcessCpuTime
    val wallT0 = System.nanoTime()

    // two runs per query, report the min: a single pass conflates each
    // query's cost with whatever JIT/GC state the previous queries left
    // behind (measured 55-108s total swing run-to-run); min-of-2 reports
    // steady-state per-query cost. A failed run records the sentinel -1
    // and the name lands in failed_queries — a broken query must not look
    // like a fast one (round-1 advice).
    //
    // X2 parity: each timed span also meters process-CPU via the OS bean
    // (the reference wraps every query in psutil.cpu_percent,
    // `performance_py/2-cores-6-instances.py:78-104`). Reported per query
    // as process-CPU ÷ (wall × cores) × 100 for the min-wall run — a
    // scheduling-bound query reads low, a parallel scan reads high.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val queryCpu = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed(name: String)(body: => Unit): Double = {
      def once(): (Double, Double) = {
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        try body
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          return (-1.0, -1.0)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        (wall, 100.0 * cpu / (wall * Runtime.getRuntime.availableProcessors()))
      }
      val (a, b) = (once(), once())
      if (a._1 < 0 || b._1 < 0) { queryCpu(name) = -1.0; -1.0 }
      else {
        val best = if (a._1 <= b._1) a else b
        queryCpu(name) = math.round(best._2 * 10) / 10.0
        best._1
      }
    }

    // Verdict gates whose query path embeds heavy verification (ANN
    // brute-force sweeps, ML re-fits) are benched via their RAW production
    // probe instead (round-9 advice) — the substituted names land in
    // probe_benched on the archival line so cross-round comparisons know
    // which rows changed meaning in round 10
    val queryResults = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_(name)) }
      .map { case (name, fn) =>
        val benched = SparkEntry.benchProbes.getOrElse(name, fn)
        name -> timed(name) {
          benched(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
      }

    // --- Sample loading (reference phase; see object doc) ---
    // CSV derived from the fixture once, untimed; the timed phase is
    // inferSchema load (a full pass) + stringified-sample size estimate +
    // 10% sample materialization — the reference's exact workload shape.
    val csvDir = java.nio.file.Files.createTempDirectory("graft_bench_csv").toString
    val loadingResults =
      if (only.exists(!_("sample_loading"))) Seq.empty
      else try {
        Tables(spark, sfDir).lineitem
          .write.option("header", "true").mode("overwrite").csv(csvDir)
        Seq("sample_loading" -> timed("sample_loading") {
          val df = spark.read
            .option("header", "true").option("inferSchema", "true").csv(csvDir)
          val sampleRows = df.limit(100).collect()
          val rowBytes =
            if (sampleRows.isEmpty) 0L
            else sampleRows.map(_.mkString(",").length.toLong).sum / sampleRows.length
          val estMb = rowBytes * df.count() / 1e6 // full pass, like the reference
          require(estMb >= 0)
          df.sample(withReplacement = false, 0.1, seed = 42)
            .write.format("noop").mode("overwrite").save()
        })
      } finally {
        // best-effort temp cleanup; never lose the JSON line over it
        try {
          val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(csvDir))
          try stream.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally stream.close()
        } catch { case _: Throwable => () }
      }

    // --- ML fits (reference model rows) ---
    // One cached feature frame, per-model fit+eval timed — matches the
    // reference, which featurizes once and times each model's fit+metrics.
    // filtered PER MODEL: SPARK_GRAFT_BENCH_ONLY=ml_fit_DecisionTree must
    // time (and record) only that fit, per the env var's contract — the
    // shared featurize frame is still built once for whatever subset runs
    val mlModels = Seq("LinearRegression", "DecisionTree", "RandomForest")
      .filter(m => only.forall(_(s"ml_fit_$m")))
    val mlResults = if (mlModels.isEmpty) Seq.empty
    else {
      val t = Tables(spark, sfDir)
      val parts = math.max(2, math.min(spark.sparkContext.defaultParallelism / 4, 8))
      val feat = graft.ml.PricePipeline.featurize(t).repartition(parts).cache()
      try {
        feat.count() // materialize outside the timings
        val Array(train, test) = feat.randomSplit(Array(0.8, 0.2), seed = 42)
        mlModels.map { m =>
          val reg = graft.ml.PricePipeline.regressors.toMap.apply(m)
          s"ml_fit_$m" -> timed(s"ml_fit_$m") {
            graft.ml.PricePipeline.fitEval(m, reg, train, test)
            ()
          }
        }
      } finally { feat.unpersist(); () }
    }

    // sf1 headline leg (round-10): when benching the driver's sf0.1
    // fixture and the GenScale'd sf1 replica exists (local/sf1, 10× —
    // regenerated per round from the current fixtures), ALSO time the
    // headline map queries a decade up. At sf0.1/local[32] most rows are
    // overhead-bound (cpu_percent ~13); the sf1 rows are data-bound and
    // the fairer 2×-gate comparison, so the driver artifact carries both.
    val sf1Dir = "local/sf1"
    val sf1Results =
      if (only.isEmpty && sfDir.contains("sf0.1") &&
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf1Dir)))
        headline.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
          .map { case (n, fn) =>
            val benched = SparkEntry.benchProbes.getOrElse(n, fn)
            n -> timed(s"sf1:$n") {
              benched(spark, sf1Dir).write.format("noop").mode("overwrite").save()
            }
          }
      else Seq.empty

    val results = queryResults ++ loadingResults ++ mlResults
    val cpuSec = (osBean.getProcessCpuTime - cpuT0) / 1e9
    val cpuPct = 100.0 * cpuSec /
      ((System.nanoTime() - wallT0) / 1e9 * Runtime.getRuntime.availableProcessors())
    SuiteRun(results, sf1Results, failed.toSeq, queryCpu.toSeq, cpuPct)
  }

  private val headline = Seq(
    "q1_group_count_avg", "q2_median_by_priority", "q2_approx_median",
    "q3_status_share", "sample_loading", "ml_fit_LinearRegression",
    "ml_fit_DecisionTree", "ml_fit_RandomForest",
    "dedup_minhash", "ann_knn_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false") // reference dirty-CSV semantics: bad casts -> null (SURVEY 1.2/7.3)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up session-level one-time costs (JIT, codegen, collation
    // registry, parquet reader init, JSON parser, streaming engine) so they
    // don't land on whichever query alphabetically touches the expression
    // class first. Round-1 driver bench showed events_json_stats at 15 s
    // (vs 0.4 s steady-state) and the first streaming query at 11 s —
    // first-touch init for from_json/get_json_object and the streaming
    // runtime; both paths are exercised here explicitly.
    try {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      import org.apache.spark.sql.functions._
      spark.range(1000).toDF("id")
        .withColumn("s", concat(lit("warm_"), col("id").cast("string")))
        .filter(!lower(col("s")).like("%zz%") && !col("s").contains("qq"))
        .select(upper(col("s")).as("u"), md5(col("s")).as("m"),
          xxhash64(col("s")).as("x"),
          regexp_extract(col("s"), "([0-9]+)", 1).as("r"))
        .write.format("noop").mode("overwrite").save()
      // JSON expression path (from_json + get_json_object codegen/parser init)
      spark.range(1000).toDF("id")
        .withColumn("j", concat(lit("{\"k\":"), col("id").cast("string"), lit("}")))
        .select(
          from_json(col("j"), graft.operators.EventOps.propsSchema).getField("k").as("k1"),
          get_json_object(col("j"), "$.k").cast("int").as("k2"))
        .filter(col("k1") === col("k2"))
        .write.format("noop").mode("overwrite").save()
      // Streaming engine init (micro-batch planner, state store, memory sink)
      graft.streaming.EventStream
        .dedupCounts(spark, sfDir, s"bench_warm_${System.nanoTime()}")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the suite to the named
    // queries — the targeted-scale legs (sf10 dedup/ANN scaling) time a
    // handful of families without paying the full 150-query suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // restricted to the rows that actually ran: under SPARK_GRAFT_BENCH_ONLY
    // the field must keep meaning "which rows in THIS artifact changed
    // meaning", not list substitutions for absent queries
    val probeBenchedJson = SparkEntry.queries.keySet
      .intersect(SparkEntry.benchProbes.keySet)
      .filter(n => only.forall(_(n))).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")

    // --- Contention sentinel (see object doc + BenchCalibration) ---
    val sentinel =
      BenchCalibration.withSentinel(() => runSuite(spark, sfDir, only))
    val run = sentinel.result
    // calibration_ratio keeps its r11 meaning (the headline the driver
    // reads) but is now the max of the PRE- and POST-suite probes; both
    // sides ship alongside so a mid-run contention arrival is visible
    val calibJson = s""""calibration_ratio":${sentinel.ratioMax},""" +
      s""""calibration_ratio_pre":${sentinel.ratioPre},""" +
      s""""calibration_ratio_post":${sentinel.ratioPost},""" +
      s""""host_degraded":${sentinel.hostDegraded},""" +
      s""""suite_rerun":${sentinel.suiteRerun}"""

    val results = run.results
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // X1 (ref estimates dataset MB by stringifying rows — SURVEY §2.12
    // flags that as a full extra scan): parquet footprint from the files.
    // Walk defensively — a bad sfDir must not lose the JSON line after all
    // queries already ran.
    val sfBytes =
      try {
        val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
        try stream.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally stream.close()
      } catch { case _: Throwable => -1L }
    val failedJson = run.failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qcpu = run.queryCpu.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sf1Json = run.sf1Results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Two JSON lines. The driver keeps only a fixed-size (~2 KB) tail of
    // stdout: round 6 lost the wall times to the CPU map, and round 7's
    // reorder still overflowed the window once the query map passed 150
    // entries, leaving the line start (metric/value) truncated and
    // "parsed": null in the artifact. So:
    //  - line 1 (archival, for bench_runs/): the FULL record with every
    //    per-query second and the CPU map; too long for the tail by design.
    //  - line 2 (FINAL, driver-parsed): a compact record — suite total plus
    //    the headline queries graded against BASELINE.md — guaranteed to
    //    fit the tail window whole.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","input_bytes":$sfBytes,"cpu_percent":${math.round(run.cpuPct * 10) / 10.0},$calibJson,"query_cpu_percent":$qcpu,"runs_per_query":2,"aggregation":"min","probe_benched":$probeBenchedJson,"failed_queries":$failedJson,"queries_sf1":$sf1Json,"queries":$qs}""")
    val resultMap = results.toMap
    val headQs = headline.flatMap(k => resultMap.get(k).map(v =>
        "\"" + k + "\":" + math.round(v * 1000) / 1000.0))
      .mkString("{", ",", "}")
    val headSf1 = run.sf1Results.map { case (k, v) =>
      "\"" + k + "\":" + math.round(v * 1000) / 1000.0 }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","sf":"$sfDir","input_bytes":$sfBytes,"cpu_percent":${math.round(run.cpuPct * 10) / 10.0},$calibJson,"n_queries":${results.size},"runs_per_query":2,"aggregation":"min","failed_queries":$failedJson,"queries_sf1":$headSf1,"queries":$headQs}""")

    // X3 parity (ref `performance_py/...py:1457-1465`): results as a
    // driver-built table -> header CSV, when a sink path is configured
    sys.env.get("SPARK_GRAFT_BENCH_CSV").foreach { out =>
      import spark.implicits._
      graft.sources.CsvIO.write(
        results.toDF("query", "seconds").orderBy("query"), out)
    }
    spark.stop()
  }
}
