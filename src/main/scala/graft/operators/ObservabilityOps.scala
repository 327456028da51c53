package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe` — the zero-extra-pass
  * counters a 100 TB intake run needs. A production filter stage must
  * report what it saw and what it dropped; recomputing those counts as
  * separate aggregates doubles the scan bill. `observe` attaches an
  * AggregatingAccumulator to the SAME pass that executes the pipeline:
  * the metrics are collected as a side effect of the action that was
  * running anyway, and they are exact (count/sum accumulate
  * deterministically regardless of partitioning), so the emitted row is
  * a FULL hash gate — the oracle states every column directly.
  */
object ObservabilityOps {

  /** Gate query: observe intake counters (docs seen, chars seen, docs
    * below the length floor) on the pre-filter stream while ONE action
    * drives the kept-side count. Emits the observed metrics next to the
    * action's own result; `n_docs == short_docs + n_kept` is the
    * conservation law the spec pins. The single driver-side `.get` is a
    * 1-row metrics fetch, not a data collect.
    */
  def observedIntakeStats(t: Tables, minChars: Int = 100): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val obs = Observation()
    val source = t.documents.filter(col("text").isNotNull)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        count(when(length(col("text")) < minChars, 1)).as("short_docs"))
    val nKept = source.filter(length(col("text")) >= minChars).count()
    val m = obs.get
    // a sum over zero observed rows is NULL (matching SQL); unboxing it
    // to Long would silently coin a 0 the oracle doesn't state
    Seq((m("n_docs").asInstanceOf[Long],
      Option(m("total_chars").asInstanceOf[java.lang.Long]).map(_.toLong),
      m("short_docs").asInstanceOf[Long],
      nKept))
      .toDF("n_docs", "total_chars", "short_docs", "n_kept")
  }
}
