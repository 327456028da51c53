package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted probe for ISOLATED model-fit walls — the attribution tool
  * behind the `ml_price_metrics_full` makespan notes (BENCH.md): the
  * suite's per-model walls are IN-POOL (they include neighbor
  * contention), so judging whether the row is makespan-bound on the
  * whale needs the whale's wall measured alone, in the same local[32]
  * session shape as Bench:
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.FitProbe <sfDir> [model,...]'
  *
  * Round-16 measurement (local/sf1, 1.5M rows): FMRegressor isolated
  * 29.8 s warm vs 33.8 s in-pool — the 9-model row (~36 s) IS the whale
  * plus feature materialization, and FM is COMPUTE-bound at reference
  * hyperparams (walls RISE as partitions shrink: 40/60/86/153 s at
  * 32/8/4/2), so the row's floor is the whale's arithmetic, not
  * scheduling.
  */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val models = if (args.length > 1) args(1).split(",").toSeq else Seq("FMRegressor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.core.Tables(spark, args(0))
    for (_ <- 1 to 2) { // second pass reports the warm wall
      graft.ml.PricePipeline.resetModelFitWalls()
      val t0 = System.nanoTime()
      graft.ml.PricePipeline.metricsTable(t, models).collect()
      println(s"FITPROBE ${models.mkString(",")} ${(System.nanoTime() - t0) / 1e9}s " +
        s"walls=${graft.ml.PricePipeline.modelFitWalls.toMap}")
    }
    spark.stop()
  }
}
