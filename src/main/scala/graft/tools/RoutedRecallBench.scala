package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted benchmark for the ROUTED-ingest recall point (round-16
  * verdict item 3's "sf10 measured point"): builds the
  * isotropic-centroid index at the given nlist through the production
  * routed ingest ([[graft.operators.SimilarityOps.routedIngestIndexFor]]
  * — two-level assignment + cell-coalesced append), then reports, as one
  * JSON line per run:
  *
  *  - `ingest_sec`: wall for the full build (assignment + partitioned
  *    write) — the backfill cost;
  *  - `probe64_sec`: one k=10 probe at nprobe = 64, min-of-2 after an
  *    untimed warm pass — the steady-state query cost;
  *  - `recall_at`: hits-of-k against brute force per probe width — the
  *    measured recall of the routed index on THIS corpus (the gate's
  *    floors are fixture-calibrated; this is the raw number at scale);
  *  - `n_files`: vector files on disk — evidence the coalesced layout
  *    held (≤ one per non-empty cell, not O(tasks·cells)).
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.RoutedRecallBench <sfDir> <nlist>'
  */
object RoutedRecallBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 4096
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = graft.core.Tables(spark, sfDir)
    val n = t.embeddings.count()

    val t0 = System.nanoTime()
    val path = graft.operators.SimilarityOps.routedIngestIndexFor(t, nlist)
    val ingestSec = (System.nanoTime() - t0) / 1e9

    val k = 10
    val truth = graft.operators.SimilarityOps.bruteForceTopK(t, 0L, k)
      .collect().map(_.getLong(0)).toSet
    val widths = (Seq(16, 64, 256, 1024, 4096) ++ Seq(nlist))
      .filter(_ <= nlist).distinct
    val recalls = widths.map { np =>
      val ids = graft.operators.SimilarityOps
        .ivfRecallRoutedProbe(t, k, nlist, np)
        .collect().map(_.getLong(0))
      np -> ids.count(truth.contains)
    }

    def probeOnce(): Double = {
      val p0 = System.nanoTime()
      graft.operators.SimilarityOps.ivfRecallRoutedProbe(t, k, nlist, 64)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - p0) / 1e9
    }
    probeOnce() // warm
    val probeSec = math.min(probeOnce(), probeOnce())

    val nFiles = {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/vectors"))
      try stream.filter(p => p.toString.endsWith(".parquet")).count()
      finally stream.close()
    }

    val recallJson = recalls
      .map { case (np, h) => s""""$np":$h""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"ivf_routed_recall","sf":"$sfDir","n_vectors":$n,""" +
        s""""nlist":$nlist,"k":$k,"ingest_sec":${math.round(ingestSec * 1000) / 1000.0},""" +
        s""""probe64_sec":${math.round(probeSec * 1000) / 1000.0},""" +
        s""""recall_at":$recallJson,"n_files":$nFiles,""" +
        s""""runs_per_probe":2,"aggregation":"min"}""")
    spark.stop()
  }
}
