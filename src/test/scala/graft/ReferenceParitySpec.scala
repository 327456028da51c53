package graft

import graft.functions.TextFunctions.dealerCategory
import org.apache.spark.sql.functions._

/** Observable-behavior parity with the reference pipelines on a
  * vehicles-shaped literal frame (SURVEY.md §5.2 item 3: same shapes and
  * column names, including the reference's quirks, not byte-identical
  * tables).
  */
class ReferenceParitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vehicles = Seq(
    ("ford", 12000, "tx", "Great truck, call us today for financing", "this is a 2008 ford f-150"),
    ("ford", 8000, "ca", null, "selling my 1999 ranger"),
    ("toyota", 15000, "wa", "Buy online with carvana delivery", "2015 corolla runs great"),
    ("bmw", 30000, "ca", "Guaranteed inspection at our automotive center", "2020 m3"))
    .toDF("manufacturer", "price", "state", "description", "details")

  test("A1 dict-agg default column names match the reference transcripts") {
    // ref `data-understanding.py:75-81` → golden output columns
    // `count(manufacturer)`, `avg(price)` (notebooks_outputs/...txt:44)
    val out = vehicles.groupBy("manufacturer")
      .agg(count("manufacturer"), avg("price"))
    assert(out.columns.toSeq ==
      Seq("manufacturer", "count(manufacturer)", "avg(price)"))
  }

  test("P4 quirk: renaming a non-existent column is a silent no-op") {
    // ref `data-understanding.py:79` renames 'median(price)' which never
    // existed; Spark keeps the frame unchanged rather than erroring
    val agg = vehicles.groupBy("manufacturer").agg(avg("price"))
    val renamed = agg.withColumnRenamed("median(price)", "median_price")
    assert(renamed.columns.toSeq == agg.columns.toSeq)
  }

  test("U1 dealer categorization: exact reference keywords incl. carMax quirk") {
    val got = vehicles.filter(col("description").isNotNull)
      .withColumn("category", dealerCategory(col("description")))
      .select("description", "category").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("Great truck, call us today for financing") == "Physical dealership")
    assert(got("Buy online with carvana delivery") == "Online dealership")
    assert(got("Guaranteed inspection at our automotive center") == "Physical dealership")
    // null description → Private party
    assert(vehicles.filter(col("description").isNull)
      .select(dealerCategory(col("description"))).head().getString(0) == "Private party")
    // the reference's 'carMax' needle is checked against lowered text and
    // can never match — 'carmax' in a description must NOT classify online
    val carmax = Seq("certified carmax listing").toDF("description")
      .select(dealerCategory(col("description"))).head().getString(0)
    assert(carmax == "Private party")
  }

  test("F3 year extraction with the reference's regex") {
    // ref `data-understanding.py:190-193`
    val pat = "\\b(19[0-9][0-9]|20[0-2][0-9])\\b"
    val out = vehicles
      .withColumn("year", regexp_extract(col("details"), pat, 0).cast("integer"))
      .filter(col("year").isNotNull)
      .orderBy("year")
      .select("year").as[Int].collect().toSeq
    assert(out == Seq(1999, 2008, 2015, 2020))
  }

  test("Query-2 shape: row_number over global order added then dropped") {
    // ref `data-understanding.py:211-214` / perf harness Query 2
    import org.apache.spark.sql.expressions.Window
    val q2 = vehicles
      .groupBy(upper(col("state")).as("state"))
      .agg(count("state").as("num_listings"),
        expr("percentile_approx(price, 0.5)").as("median_price"))
      .withColumn("row_num", row_number().over(Window.orderBy(asc("state"))))
      .drop("row_num")
    assert(q2.columns.toSeq == Seq("state", "num_listings", "median_price"))
    assert(q2.count() == 3)
  }
}
