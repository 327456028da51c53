package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Seeded-sampling gates are partition-dependent, so they can never be
  * hash-gated against DuckDB — but "rows-only" need not mean "unchecked".
  * [[SamplingInvariants]] verifies the properties that ARE well-defined
  * (bounds, disjointness/subset structure, in-session determinism) before
  * the output is written; a violation throws, the query records as failed,
  * and the driver's rows-only row goes red instead of silently green.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false") // reference dirty-CSV semantics: bad casts -> null (SURVEY 1.2/7.3)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        SamplingInvariants.check(name, df, fn, spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

/** Property checks for the seeded-sampling rows-only gates (round-4
  * verdict item 7). Each check states an invariant that holds regardless
  * of partition layout:
  *
  *  - `sample_orders` — sampled keys are a DISTINCT SUBSET of the source
  *    keys; the row count sits inside a 6σ binomial band around
  *    fraction·N; a second in-session run returns the identical key set
  *    (same seed + same partitioning ⇒ deterministic).
  *  - `split_counts` — the 80/20 split is a PARTITION of the source
  *    (counts sum to N exactly, both sides nonempty) with the train share
  *    inside a wide band around 0.8; deterministic on re-run.
  *  - `sample_stratified` — per-stratum counts sit inside the 6σ band of
  *    that stratum's own fraction (0.05/0.05/0.5); deterministic.
  *  - `row_ids` — exactly one id per source row and all ids unique (the
  *    values themselves are partition-dependent by contract).
  *
  * 6σ + 10 keeps the bands false-positive-free (≪1e-8 per gate) while
  * still catching a wrong fraction, a double-sample, or a lost stratum.
  */
object SamplingInvariants {
  private type QueryFn = (SparkSession, String) => DataFrame

  private def binomialBand(n: Long, p: Double): (Long, Long) = {
    val mean = n * p
    val slack = 6.0 * math.sqrt(n * p * (1 - p)) + 10.0
    (math.floor(mean - slack).toLong, math.ceil(mean + slack).toLong)
  }

  private def inBand(what: String, got: Long, n: Long, p: Double): Unit = {
    val (lo, hi) = binomialBand(n, p)
    require(got >= lo && got <= hi,
      s"invariant: $what count $got outside [$lo, $hi] (p=$p of $n)")
  }

  def check(name: String, df: DataFrame, fn: QueryFn,
            spark: SparkSession, sfDir: String): Unit = name match {
    case "sample_orders" =>
      val orders = core.Tables(spark, sfDir).orders
      val n = orders.count()
      val keys = df.select("o_orderkey")
      require(keys.exceptAll(orders.select("o_orderkey")).count() == 0,
        "invariant: sampled keys not a subset of source keys")
      val got = df.count()
      require(keys.distinct().count() == got,
        "invariant: duplicate keys in a without-replacement sample")
      inBand("sample_orders", got, n, 0.1)
      val rerun = fn(spark, sfDir).select("o_orderkey")
      require(keys.exceptAll(rerun).count() == 0 &&
        rerun.exceptAll(keys).count() == 0,
        "invariant: seeded sample not deterministic within the session")
    case "split_counts" =>
      val n = core.Tables(spark, sfDir).orders.count()
      val counts = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(counts.keySet == Set("train", "test") &&
        counts.values.sum == n && counts.values.forall(_ > 0),
        s"invariant: split $counts does not partition the $n source rows")
      inBand("split_counts train", counts("train"), n, 0.8)
      val again = fn(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(again == counts, "invariant: seeded split not deterministic")
    case "sample_stratified" =>
      val fractions = Map("F" -> 0.05, "O" -> 0.05, "P" -> 0.5)
      val strata = core.Tables(spark, sfDir).orders
        .groupBy("o_orderstatus").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fractions.foreach { case (s, p) =>
        inBand(s"stratum $s", got.getOrElse(s, 0L), strata(s), p)
      }
      val again = fn(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(again == got, "invariant: seeded sampleBy not deterministic")
    case "row_ids" =>
      val n = core.Tables(spark, sfDir).orders.count()
      require(df.count() == n, "invariant: row_ids row count != source count")
      require(df.select(countDistinct(col("row_id"))).head().getLong(0) == n,
        "invariant: row ids not unique")
    case _ => ()
  }
}
