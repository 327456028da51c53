package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("observed metrics equal direct aggregates on the fixture") {
    val row = ObservabilityOps.observedIntakeStats(t).head()
    val direct = t.documents.filter(col("text").isNotNull).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text")).cast("long")).as("total_chars"),
      count(when(length(col("text")) < 100, 1)).as("short_docs"),
      count(when(length(col("text")) >= 100, 1)).as("n_kept")).head()
    assert(row.getAs[Long]("n_docs") == direct.getAs[Long]("n_docs"))
    assert(row.getAs[Long]("total_chars") == direct.getAs[Long]("total_chars"))
    assert(row.getAs[Long]("short_docs") == direct.getAs[Long]("short_docs"))
    assert(row.getAs[Long]("n_kept") == direct.getAs[Long]("n_kept"))
  }

  test("conservation: every observed doc is either short or kept") {
    val row = ObservabilityOps.observedIntakeStats(t).head()
    assert(row.getAs[Long]("n_docs") ==
      row.getAs[Long]("short_docs") + row.getAs[Long]("n_kept"))
  }

  test("deterministic across invocations (fresh Observation per call)") {
    val a = ObservabilityOps.observedIntakeStats(t).collect().toSeq
    val b = ObservabilityOps.observedIntakeStats(t).collect().toSeq
    assert(a == b)
  }

  test("threshold variation moves docs between short and kept, never loses one") {
    val lo = ObservabilityOps.observedIntakeStats(t, minChars = 1).head()
    val hi = ObservabilityOps.observedIntakeStats(t, minChars = 10000).head()
    assert(lo.getAs[Long]("n_docs") == hi.getAs[Long]("n_docs"))
    assert(lo.getAs[Long]("short_docs") <= hi.getAs[Long]("short_docs"))
    assert(lo.getAs[Long]("n_kept") >= hi.getAs[Long]("n_kept"))
    assert(hi.getAs[Long]("n_docs") ==
      hi.getAs[Long]("short_docs") + hi.getAs[Long]("n_kept"))
  }
}
