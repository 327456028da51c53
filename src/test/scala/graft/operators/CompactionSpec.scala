package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Small-file compaction ([[LayoutOps.compactWrite]]): the file-count
  * arithmetic against the real listing, the zero-shuffle property of the
  * coalesce path, losslessness, and the zone-map clustering the sorted
  * path exists for.
  */
class CompactionSpec extends SparkTestBase {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("planned file count = ceil(listing bytes / target); files and rows arrive intact") {
    val frag = LayoutOps.fragmentedLineitem(t, files = 64)
    assert(parquetFiles(frag).length == 64)
    val bytes = LayoutOps.parquetBytes(spark, frag)
    val target = 256L * 1024
    val (dir, n) = LayoutOps.compactWrite(spark, frag, target)
    assert(n == ((bytes + target - 1) / target).toInt)
    // coalesce can only merge, never split: at most n files, and the
    // data survives bit-for-bit
    assert(parquetFiles(dir).length <= n)
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(dir)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("coalesce path is a narrow dependency — zero exchanges in the write plan") {
    val frag = LayoutOps.fragmentedLineitem(t, files = 16)
    val n = 2
    val plan = spark.read.parquet(frag).coalesce(n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"coalesce compaction must not shuffle:\n$plan")
  }

  test("sorted compaction leaves per-file zone maps non-overlapping on the sort key") {
    val frag = LayoutOps.fragmentedLineitem(t, files = 32)
    val (dir, _) = LayoutOps.compactWrite(spark, frag,
      targetBytes = 64L * 1024, sortCol = Some("l_orderkey"))
    val files = parquetFiles(dir)
    assert(files.length >= 2, "fixture should compact into 2+ files for the span check")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // range-partitioned + sorted ⇒ consecutive files' key ranges don't
    // interleave (boundary duplicates of the same key may share files)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"file ranges overlap: hi=$hi lo2=$lo2")
    case _ => ()
    }
  }

  test("dynamic overwrite replaces exactly the batch's partition: bucket 3 swapped, the other 7 byte-identical") {
    import org.apache.spark.sql.functions._
    // ONE write/overwrite/rollup cycle; pick buckets from the collected rows
    val byBucket = LayoutOps.dynamicOverwriteRoundtrip(t).collect()
      .map(r => r.getAs[Int]("bucket") -> r).toMap
    val row3 = byBucket(3)
    val src3 = t.orders.filter(col("o_orderkey") % 8 === 3)
    // replaced, not appended: same count, every price +1
    assert(row3.getAs[Long]("n_orders") == src3.count())
    val wantSum = src3.agg(
      graft.functions.NumericFunctions.roundN(
        graft.functions.NumericFunctions.decSum(col("o_totalprice") + 1), 2))
      .head().getDouble(0)
    assert(row3.getAs[Double]("total_price") == wantSum)
    // and an untouched bucket matches the source exactly
    val row0 = byBucket(0)
    val src0 = t.orders.filter(col("o_orderkey") % 8 === 0)
    assert(row0.getAs[Long]("n_orders") == src0.count())
    assert(row0.getAs[Double]("total_price") == src0.agg(
      graft.functions.NumericFunctions.roundN(
        graft.functions.NumericFunctions.decSum(col("o_totalprice")), 2))
      .head().getDouble(0))
  }

  test("gate probe equals the same probe over the source table") {
    val compacted = LayoutOps.compactRoundtrip(t).collect()
    val source = t.lineitem
      .filter(col("l_shipdate") >= "1995-01-01")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        graft.functions.NumericFunctions.roundN(
          graft.functions.NumericFunctions.decSum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(compacted.toSeq == source.toSeq)
  }

  // --- range-partitioned write (round 12) ---

  test("range layout: footer verdicts hold, and a point lookup prunes to exactly one file") {
    val row = LayoutOps.rangeWriteStats(t).head()
    assert(row.getAs[Boolean]("n_files_in_bound"))
    assert(row.getAs[Long]("n_rows") == t.orders.count())
    assert(row.getAs[Boolean]("ranges_disjoint"))
    assert(row.getAs[Boolean]("files_balanced"))
    assert(row.getAs[Boolean]("stats_complete_all"))

    // disjoint footer ranges make a key probe touch exactly one file —
    // the property the layout exists for. First pin that the layout
    // actually SPLIT (round-13 advice): with a single file, disjointness,
    // balance and one-file pruning are all trivially true — the unique
    // dense o_orderkey fixture must land in >1 file for any of the
    // assertions below to mean anything.
    val dir = LayoutOps.rangeLayoutDir(t)
    val nFiles = graft.sources.ParquetStats
      .footerStats(t, dir, Seq("o_orderkey")).count()
    assert(nFiles >= 2,
      s"range layout collapsed to $nFiles file(s) on a dense unique-key fixture")
    val someKey = t.orders.agg(min(col("o_orderkey"))).head().getLong(0)
    val touched = spark.read.parquet(dir)
      .filter(col("o_orderkey") === someKey)
      .select(input_file_name()).distinct().count()
    assert(touched == 1L)
    val eligible = graft.sources.ParquetStats
      .footerStats(t, dir, Seq("o_orderkey"))
      .filter(col("min_value") <= someKey && col("max_value") >= someKey)
      .count()
    assert(eligible == 1L, "footer zone maps must rule out all but one file")
  }
}
