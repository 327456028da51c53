package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted benchmark for the PRODUCTION OOV encode regime (round-16:
  * the gated `text_bpe_encode_oov` runs the ≤ 64-merge codegen replace
  * chain; the broadcast mapPartitions replay is the 32k-merge path and
  * needs its own measured point):
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.BpeEncodeBench <vocabN> <nMerges,...> <oovN>'
  *
  * Trains driver-side on a deterministic `synth:vocabN` dictionary
  * (BpeBench's generator — the production-vocabulary surrogate), then
  * times [[graft.operators.TextOps.bpeEncodeWordsReplay]] over `oovN`
  * DISTINCT held-out words (a second-seed synthetic vocabulary with
  * training words filtered out), min-of-2 after an untimed warm pass.
  * Before timing, the replay theorem is spot-checked on 200 TRAINED
  * words (replay must reproduce the dict seq exactly) — the bench
  * refuses to time a replay that diverges from training. Reported
  * per (nMerges): wall seconds, words/s, and the mean encoded token
  * count of the OOV set (a drifting tokenizer shows up as a count move
  * on the frozen inputs).
  */
object BpeEncodeBench {

  def main(args: Array[String]): Unit = {
    val vocabN = args(0).toInt
    val mergesList = args(1).split(",").map(_.trim.toInt).toSeq
    val oovN = if (args.length > 2) args(2).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dict0 = BpeBench.synthDict(spark, vocabN).localCheckpoint(true)
    val trainWords = dict0.select("w").as[String].collect().toSet
    val oovWords = BpeBench.synthDict(spark, oovN + vocabN / 4, seed = 0x2545F4914F6CDD1DL)
      .select("w").as[String].collect()
      .filterNot(trainWords).distinct.take(oovN)
    val oovDf = oovWords.toSeq.toDF("w")
      .repartition(cpus.toInt).localCheckpoint(true)

    mergesList.foreach { nMerges =>
      val (dict, learned) =
        graft.operators.TextOps.bpeTrainOnDriver(spark, dict0, nMerges)
      val merges = learned.map(m => (m._2, m._3))
      // replay-theorem spot check on trained words — refuse to time a
      // diverged replay
      dict.select("w", "seq").limit(200).collect().foreach { r =>
        val replay =
          graft.operators.TextOps.bpeApplyMerges(r.getString(0), merges.toArray)
        require(replay == r.getString(1),
          s"replay diverged from training for '${r.getString(0)}'")
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.TextOps.bpeEncodeWordsReplay(oovDf, merges)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (broadcast, codegen)
      val wall = math.min(once(), once())
      val meanToks = graft.operators.TextOps.bpeEncodeWordsReplay(oovDf, merges)
        .select(avg(size(split(col("seq"), " ")))).head().getDouble(0)
      println(
        s"""{"metric":"bpe_encode_oov","vocab":$vocabN,"n_merges":$nMerges,""" +
          s""""oov_words":${oovWords.length},"encode_sec":${math.round(wall * 1000) / 1000.0},""" +
          s""""words_per_sec":${math.round(oovWords.length / wall)},""" +
          s""""mean_oov_tokens":${math.round(meanToks * 1000) / 1000.0},""" +
          s""""runs":2,"aggregation":"min"}""")
    }
    spark.stop()
  }
}
