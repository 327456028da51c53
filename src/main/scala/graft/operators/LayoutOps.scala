package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators — the write-side lever the read-side plans in
  * PLANS.md assume. At 100 TB the fastest scan is the one that never
  * happens: parquet row-group min/max (zone maps) prune files whose key
  * range can't match, but only if the writer clustered rows so ranges are
  * tight. A single-column `sortWithinPartitions` gives that for ONE
  * column; the 2-D Morton key [[graft.plans.ZOrder2]] (`graft_zorder`)
  * gives bounded ranges on BOTH dimensions at once — the
  * OPTIMIZE/ZORDER-style layout for fact tables probed along multiple
  * axes. `ZOrderSpec` measures the property directly: contiguous chunks
  * of the z-sorted fixture have day-spans AND custkey-spans both bounded,
  * where the custkey-sorted layout leaves day-spans at full width.
  */
object LayoutOps {

  /** The z-order clustering key for every order: x = o_custkey, y = the
    * epoch day number of o_orderdate, both NORMALIZED to a 16-bit
    * [0, 65535] range before interleaving. Normalization is what makes
    * the curve work: raw dims of different magnitudes put one dim's
    * varying bits entirely above the other's, and the z-sort degenerates
    * to a single-column sort (the spec's layout test catches exactly
    * that regression). The mapping is
    * `floor((v - min) · 65536 / (max - min + 1))` — the dividend is an
    * exact integer in a double and the divisor an integer, so the one
    * correctly-rounded IEEE division (then floor) is bit-identical in
    * any engine: the DuckDB oracle replays the full pipeline including
    * the generated 32-term shift/mask interleave. Production layout jobs
    * substitute approximate range boundaries (a quantile sketch) for the
    * exact min/max; here exact bounds keep the gate hash-checkable.
    *
    * This is the exact column a layout job would
    * `repartitionByRange(col("z")).sortWithinPartitions("z")` on before
    * writing. Cost: one global min/max agg (4 longs to the driver via a
    * broadcast-joined 1-row frame — the [[JoinOps.aboveAveragePrice]]
    * scalar-subquery shape), then an embarrassingly parallel projection.
    */
  def zorderIndex(t: Tables): DataFrame = {
    val d = t.orders
      .select(
        col("o_orderkey"),
        col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("y"))
    val bounds = d.agg(
      min("x").as("mnx"), max("x").as("mxx"),
      min("y").as("mny"), max("y").as("mxy"))
    def norm(v: Column, mn: Column, mx: Column): Column =
      floor((v - mn).cast("double") * lit(65536.0) / (mx - mn + 1).cast("double"))
        .cast("long")
    d.crossJoin(broadcast(bounds))
      .select(col("o_orderkey"), col("x"), col("y"),
        call_function("graft_zorder",
          norm(col("x"), col("mnx"), col("mxx")),
          norm(col("y"), col("mny"), col("mxy"))).as("z"))
  }
}
