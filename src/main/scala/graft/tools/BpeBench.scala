package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted benchmark for the thresholded BPE training loop (round-14
  * verdict item 3's measured point):
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.BpeBench <sfDir|synth:N> <nMerges,...> [clusterMax]'
  *
  * The corpus → (word, seq, freq) dictionary pass runs ONCE, untimed
  * (both paths share it; it is the only part that touches the data).
  * Per merge count it then times the on-cluster loop (one driver-
  * synchronized Spark job per merge — the gated path) against the
  * driver-side delta loop over the same dictionary, min-of-2 with an
  * untimed warm pass, and prints one JSON line with the per-merge cost
  * of each — the readout that shows the driver path's per-merge cost is
  * no longer a fixed job quantum. Merge-table equality is asserted on
  * every pass where both run (the bench refuses to time two paths that
  * diverge).
  *
  * `synth:N` sizes the claim at a PRODUCTION vocabulary (the fixture
  * corpus has ~310 distinct words): a deterministic LCG-generated dict
  * of N words (length 4–14, Zipf-ish frequencies) — the regime where
  * per-merge driver cost is an O(vocab) substring scan, not the corpus.
  * `clusterMax` (default 64) caps the merge counts the cluster path is
  * timed at — at a job quantum per merge, 1024 merges on-cluster would
  * be minutes of pure queue overhead; skipped legs report -1.
  */
object BpeBench {

  /** Deterministic synthetic (word, seq, freq) dictionary via a
    * constant-seeded LCG — reruns time identical work.
    */
  private[tools] def synthDict(spark: SparkSession, n: Int, seed: Long = 0x9E3779B97F4A7C15L)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    var s = seed
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L; s
    }
    val words = new scala.collection.mutable.LinkedHashSet[String]
    while (words.size < n) {
      val len = 4 + math.floorMod(next(), 11L).toInt
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        sb.append(('a' + math.floorMod(next(), 26L)).toChar); i += 1
      }
      words += sb.toString
    }
    words.toSeq.zipWithIndex
      .map { case (w, i) =>
        (w, w.toCharArray.mkString(" "), (n.toLong / (i + 1)) + 1L) }
      .toDF("w", "seq", "freq")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMergesList = args(1).split(",").map(_.trim.toInt).toSeq
    val clusterMax = args.lift(2).map(_.toInt).getOrElse(64)
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

    // the PRODUCTION dictionary pass (TextOps.bpeDict0 — an inline copy
    // here would silently drift from what training actually consumes)
    val dict0 =
      if (sfDir.startsWith("synth:"))
        synthDict(spark, sfDir.stripPrefix("synth:").toInt).localCheckpoint(true)
      else graft.operators.TextOps.bpeDict0(graft.core.Tables(spark, sfDir))
    val vocab = dict0.count()

    def timed(body: => Unit): Double = {
      body // warm pass
      def once(): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    nMergesList.foreach { n =>
      var clusterMerges: Seq[(Int, String, String, Long)] = null
      var driverMerges: Seq[(Int, String, String, Long)] = null
      val clusterSec =
        if (n <= clusterMax) timed {
          clusterMerges = graft.operators.TextOps.bpeTrainOnCluster(dict0, n)._2
        } else -1.0
      val driverSec = timed {
        driverMerges = graft.operators.TextOps.bpeTrainOnDriver(spark, dict0, n)._2
      }
      require(clusterMerges == null || clusterMerges == driverMerges,
        s"paths diverged at nMerges=$n — refusing to report")
      val cpm = if (clusterSec < 0) -1.0 else r3(clusterSec / n)
      println(s"""{"metric":"bpe_train","sf":"$sfDir","vocab":$vocab,"nmerges":$n,"cluster_sec":${r3(clusterSec)},"driver_sec":${r3(driverSec)},"cluster_sec_per_merge":$cpm,"driver_sec_per_merge":${r3(driverSec / n)},"runs_per_path":2,"aggregation":"min"}""")
    }
    spark.stop()
  }

  private def r3(x: Double): Double = math.round(x * 1000) / 1000.0
}
