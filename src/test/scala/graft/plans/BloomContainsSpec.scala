package graft.plans

import graft.SparkTestBase
import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** graft_bloom_contains: the codegen bloom-probe expression that replaced
  * the incremental-dedup tier-2 UDF. Membership semantics vs the sketch
  * library's own probe, null handling, whole-stage codegen participation,
  * and the tier-2 plan shape (native expression, no ScalaUDF node).
  */
class BloomContainsSpec extends SparkTestBase {
  import spark.implicits._

  private def serialized(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("probe agrees with BloomFilter.mightContainString, null in -> null out") {
    val bf = BloomFilter.create(100, 0.01)
    val members = (0 until 50).map(i => s"member_$i")
    members.foreach(bf.putString)
    val probes = members ++ (0 until 200).map(i => s"absent_$i")

    val got = probes.toDF("s")
      .union(Seq(null.asInstanceOf[String]).toDF("s"))
      .select(col("s"),
        call_function("graft_bloom_contains", col("s"), lit(serialized(bf))).as("hit"))
      .collect()
      .map(r => Option(r.getString(0)) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap

    assert(got(None).isEmpty, "null probe value must yield null")
    probes.foreach { s =>
      assert(got(Some(s)) == Some(bf.mightContainString(s)),
        s"expression disagrees with the sketch library on '$s'")
    }
    // no false negatives, and the absent keys are not all false positives
    members.foreach(s => assert(got(Some(s)) == Some(true)))
    val absentHits = (0 until 200).count(i => got(Some(s"absent_$i")) == Some(true))
    assert(absentHits < 20, s"$absentHits/200 false positives at fpp=0.01")
  }

  test("stays inside whole-stage codegen") {
    val bf = BloomFilter.create(10, 0.01)
    bf.putString("k3")
    // depend on the range column so ConvertToLocalRelation can't pre-fold
    val df = spark.range(10).select(
      call_function("graft_bloom_contains",
        concat(lit("k"), col("id").cast("string")), lit(serialized(bf))).as("hit"))
    assert(df.queryExecution.executedPlan.toString
      .contains("*(1) Project [graft_bloom_contains"))
    assert(df.collect().count(_.getBoolean(0)) >= 1)
  }

  test("tier-2 incremental dedup plans the native probe, not a UDF") {
    val df = DedupOps.incrementalDedup(t, "src0", maxBroadcastDigests = 0L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_contains"), "tier 2 must use the native probe")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"UDF node in the tier-2 plan:\n$p")
  }
}
