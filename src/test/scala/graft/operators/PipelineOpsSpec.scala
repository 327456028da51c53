package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkTestBase {

  test("intake decisions: first-failing reason composes the four stage verdicts") {
    val got = PipelineOps.intakeDecisions(t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    val cand = t.documents.filter(col("source") =!= "src15")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.size == cand.length, "every candidate doc gets exactly one verdict")

    // compose the expectation from the independently-tested components
    val winners = cand.groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
    val repOk = TextOps.repetitionStats(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val leaked = DedupOps.decontaminate(t, "src15").collect()
      .map(_.getLong(0)).toSet
    val sw = Set("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")
    cand.foreach { case (id, src, text) =>
      val tk = text.split("\\s+")
      val n = tk.length
      val swr = if (n == 0) 0.0 else tk.count(sw).toDouble / n
      val reason =
        if (!(n >= 20 && n <= 100 && swr >= 0.05)) "quality"
        else if (!repOk.getOrElse(id, false)) "repetition"
        else if (id != winners(text)) "duplicate"
        else if (leaked(id)) "contaminated"
        else "kept"
      assert(got(id) == ((src, reason, reason == "kept")),
        s"doc $id: got ${got(id)}, want ($src, $reason)")
    }
    // the fixture must exercise the composition, not a single branch
    assert(got.values.map(_._2).toSet.size >= 2,
      s"only reasons ${got.values.map(_._2).toSet} seen — fixture too uniform")
  }

  test("intake stats roll up the decisions exactly") {
    val stats = PipelineOps.intakeStats(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromDecisions = PipelineOps.intakeDecisions(t).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(stats == fromDecisions)
  }
}
