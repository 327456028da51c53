package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PartitionedParquetSpec extends SparkTestBase {

  test("partition filter prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec_").toString
    PartitionedParquet.writePartitioned(
      t.orders.withColumn("order_year", year(col("o_orderdate"))),
      dir, "order_year")

    val years = t.orders.select(year(col("o_orderdate"))).distinct().count()
    assert(years > 1, "fixture must span multiple years for pruning to mean anything")

    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    // the year predicate must be a PartitionFilter (directory pruning),
    // NOT a data filter evaluated per row after a full scan
    val pfLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pfLine.contains("order_year"), s"no partition filter in:\n$pfLine")

    // values survive the round trip exactly
    val direct = t.orders.filter(year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_totalprice")
    val roundtrip = pruned.select("o_orderkey", "o_totalprice")
    assert(roundtrip.count() == direct.count())
    assert(roundtrip.exceptAll(direct).count() == 0)
  }
}
