package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy accessors for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every table is a plain parquet directory under `dir`; reads go through
  * `spark.read.parquet` so Catalyst gets filter pushdown + column pruning
  * against the parquet footers for free. At 100 TB these would be
  * partitioned tables behind a catalog — the accessors keep that swap
  * behind one seam.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright; read it as raw long nanos
    * (legacy.parquet.nanosAsLong) and rebuild a timestamp_ntz at
    * microsecond precision with integer division (a double roundtrip would
    * lose precision above 2^53 ns).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
