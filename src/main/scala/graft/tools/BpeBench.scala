package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted benchmark for the thresholded BPE training loop (round-14
  * verdict item 3's measured point):
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.BpeBench <sfDir> <nMerges,...>'
  *
  * The corpus → (word, seq, freq) dictionary pass runs ONCE, untimed
  * (both paths share it; it is the only part that touches the data).
  * Per merge count it then times the on-cluster loop (one driver-
  * synchronized Spark job per merge — the gated path) against the
  * driver-side delta loop over the same dictionary, min-of-2 with an
  * untimed warm pass, and prints one JSON line with the per-merge cost
  * of each — the readout that shows the driver path's per-merge cost is
  * no longer a fixed job quantum. Merge-table equality is asserted on
  * every pass (the bench refuses to time two paths that diverge).
  */
object BpeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMergesList = args(1).split(",").map(_.trim.toInt).toSeq
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
    val dict0 = t.documents
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), concat_ws(" ", split(col("w"), "")).as("seq"), col("freq"))
      .localCheckpoint(true)
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
      val clusterSec = timed {
        clusterMerges = graft.operators.TextOps.bpeTrainOnCluster(dict0, n)._2
      }
      val driverSec = timed {
        driverMerges = graft.operators.TextOps.bpeTrainOnDriver(spark, dict0, n)._2
      }
      require(clusterMerges == driverMerges,
        s"paths diverged at nMerges=$n — refusing to report")
      println(s"""{"metric":"bpe_train","sf":"$sfDir","vocab":$vocab,"nmerges":$n,"cluster_sec":${r3(clusterSec)},"driver_sec":${r3(driverSec)},"cluster_sec_per_merge":${r3(clusterSec / n)},"driver_sec_per_merge":${r3(driverSec / n)},"runs_per_path":2,"aggregation":"min"}""")
    }
    spark.stop()
  }

  private def r3(x: Double): Double = math.round(x * 1000) / 1000.0
}
