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
  private def norm(v: Column, mn: Column, mx: Column): Column =
    floor((v - mn).cast("double") * lit(65536.0) / (mx - mn + 1).cast("double"))
      .cast("long")

  /** Orders plus (x, y, z): every source column survives so the keyed
    * frame is writable as the laid-out table itself. */
  private def ordersWithZ(t: Tables): DataFrame = {
    val d = t.orders
      .withColumn("x", col("o_custkey"))
      .withColumn("y",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"))
    val bounds = d.agg(
      min("x").as("mnx"), max("x").as("mxx"),
      min("y").as("mny"), max("y").as("mxy"))
    d.crossJoin(broadcast(bounds))
      .withColumn("z", call_function("graft_zorder",
        norm(col("x"), col("mnx"), col("mxx")),
        norm(col("y"), col("mny"), col("mxy"))))
      .drop("mnx", "mxx", "mny", "mxy")
  }

  def zorderIndex(t: Tables): DataFrame =
    ordersWithZ(t).select("o_orderkey", "x", "y", "z")

  /** One temp dir per JVM for the layout write, overwritten per call and
    * deleted on exit — same reuse rationale (and the same caveat) as
    * [[graft.sources.PartitionedParquet.roundtripDir]]: the DataFrames
    * returned over this dir are lazy, so MATERIALIZE a roundtrip result
    * before triggering another layout write — a later `mode("overwrite")`
    * deletes the files a still-deferred plan would scan. Verify and Bench
    * evaluate each gate promptly and sequentially, which is the intended
    * usage; concurrent writers would need per-call dirs. */
  private lazy val layoutDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val stream = java.nio.file.Files.walk(dir)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally stream.close()
      } catch { case _: Throwable => () }
    }))
    dir.toString
  }

  /** The actual layout write: orders range-partitioned AND sorted by z,
    * one parquet file per range — contiguous files are z-curve segments,
    * so every file's min/max zone map bounds BOTH x and y
    * (`ZOrderSpec` reads the written files back individually and
    * measures exactly that). Returns the directory. */
  def zorderLayoutWrite(t: Tables, partitions: Int = 8): String = {
    ordersWithZ(t)
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(layoutDir)
    layoutDir
  }

  /** Gate query: orders → z-laid-out parquet (range-partition + sort by
    * z) → read back → the canonical two-sided probe (a customer band AND
    * a date band) → per-status rollup. The oracle computes the same
    * filter+rollup straight from the source table, so the hash gate
    * proves the whole layout write path is lossless and filter semantics
    * survive the re-clustering; the zone-map tightness that makes the
    * layout worth paying for is the spec's per-file measurement.
    */
  def zorderRoundtrip(t: Tables): DataFrame = {
    import graft.functions.NumericFunctions.{decSum, roundN}
    val dir = zorderLayoutWrite(t)
    t.spark.read.parquet(dir)
      .filter(col("o_custkey").between(20, 99) &&
        col("y").between(9500, 10499))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        roundN(decSum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_orderstatus")
  }
}
