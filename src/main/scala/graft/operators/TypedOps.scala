package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One order row as a case class — the compile-time-checked face of the
  * orders table for the typed surface below.
  */
final case class OrderRow(o_custkey: Long, o_totalprice: Double, o_orderstatus: String)

/** Typed `Dataset[T]` surface — `groupByKey` / `mapGroups` with
  * case-class Encoders, the API tier the DataFrame gates deliberately
  * avoid. Kept to ONE representative gate: typed lambdas are opaque to
  * Catalyst (no pushdown through them, no codegen inside them), so the
  * untyped Column surface is the right default at 100 TB and the typed
  * path is for logic that genuinely wants Scala (pattern matching,
  * library calls) at per-group granularity.
  *
  * Scale shape: `groupByKey(_.key)` is one hash exchange on the key —
  * identical to the untyped groupBy — and `mapGroups` streams each
  * group's iterator through the lambda. Per-customer groups are small by
  * construction (orders per customer), so the iterator never
  * materializes anything large; the aggregates chosen (count/min/max)
  * are arrival-order-independent, which is what makes the gate
  * hash-checkable.
  */
object TypedOps {

  def customerOrderStats(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val ds: Dataset[OrderRow] = t.orders
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      .as[OrderRow]
    ds.groupByKey(_.o_custkey)
      .mapGroups { (custkey, rows) =>
        var n = 0L; var nOpen = 0L
        var minP = Double.MaxValue; var maxP = Double.MinValue
        rows.foreach { r =>
          n += 1
          if (r.o_orderstatus == "O") nOpen += 1
          if (r.o_totalprice < minP) minP = r.o_totalprice
          if (r.o_totalprice > maxP) maxP = r.o_totalprice
        }
        (custkey, n, nOpen, minP, maxP)
      }
      .toDF("o_custkey", "n_orders", "n_open", "min_price", "max_price")
      .orderBy("o_custkey")
  }
}
