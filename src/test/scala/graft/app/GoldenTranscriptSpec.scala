package graft.app

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Golden-transcript numeric parity (SURVEY §5.2 item 3, round-2 verdict
  * item 5): run the DataUnderstanding pipeline over the checked-in 100-row
  * `vehicles_golden.csv` and assert the EXACT output tables — values, not
  * just shapes. The Kaggle CSV isn't in the sandbox, so the fixture is the
  * honest substitute: synthetic, but every expected number below is
  * hand-checkable arithmetic from the fixture's construction —
  *
  *  - manufacturers: ford rows 1–30 at price 1000·i (avg 15500), toyota
  *    31–55 at 8000, bmw 56–65 at 10000 + 66–75 at 20000 (avg 15000),
  *    honda 76–90 at 12000, rows 91–100 have NULL manufacturer at 5000;
  *  - states in id blocks: ca 1–21, tx 22–40, ny 41–65, wa 66–82,
  *    fl 83–100 — group sizes odd (or median-unambiguous) by design, so
  *    the per-state median element is pinned;
  *  - title_status: salvage exactly on ids {1,2,3,4, 22,23,24, 41,42, 66}
  *    → 4/3/2/1 per state of 10 total → 40/30/20/10 percent.
  */
class GoldenTranscriptSpec extends SparkTestBase {

  private lazy val vehicles: DataFrame = {
    val path = getClass.getResource("/vehicles_golden.csv").getPath
    VehiclesPipelines.load(spark, path).cache()
  }

  test("golden fixture loads with the 26-column all-strings schema, 100 rows") {
    assert(vehicles.columns.toSeq == VehiclesPipelines.columns)
    assert(vehicles.schema.fields.forall(_.dataType.typeName == "string"))
    assert(vehicles.count() == 100)
    // CSV empty fields must land as NULLs (the dirty-data contract)
    assert(vehicles.filter(vehicles("manufacturer").isNull).count() == 10)
    assert(vehicles.filter(vehicles("county").isNull).count() == 100)
  }

  test("Query 1 transcript: listings + mean price per manufacturer, exact") {
    val got = VehiclesPipelines.DataUnderstanding.listingsPerManufacturer(vehicles)
    // transcript column names are the dict-agg defaults (ref transcript :44)
    assert(got.columns.toSeq == Seq("manufacturer", "count(manufacturer)", "avg(price)"))
    val rows = got.collect().map(r =>
      (Option(r.getString(0)).orNull, r.getLong(1), r.getDouble(2)))
    // sorted desc by non-null count; the NULL-manufacturer group counts 0
    assert(rows.toSeq == Seq(
      ("ford", 30L, 15500.0),
      ("toyota", 25L, 8000.0),
      ("bmw", 20L, 15000.0),
      ("honda", 15L, 12000.0),
      (null, 0L, 5000.0)))
  }

  test("Query 2 transcript: per-state count + approx median price, exact") {
    val got = VehiclesPipelines.DataUnderstanding.statePriceMedians(vehicles)
    assert(got.columns.toSeq == Seq("state", "num_listings", "median_price"))
    val rows = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // medians pinned by construction: CA 1000..21000 → rank-11 element;
    // TX {8000×10, 22000..30000} → rank 10; NY {8000×15, 10000×10} → rank
    // 13; WA {12000×7, 20000×10} → rank 9; FL {5000×10, 12000×8} → ranks
    // 9 and 10 both 5000 (even n, value unambiguous)
    assert(rows.toSeq == Seq(
      ("CA", 21L, 11000.0),
      ("FL", 18L, 5000.0),
      ("NY", 25L, 8000.0),
      ("TX", 19L, 8000.0),
      ("WA", 17L, 20000.0)))
  }

  test("Query 3 transcript: salvage share per state, exact") {
    val got = VehiclesPipelines.DataUnderstanding.salvageShareByState(vehicles)
    assert(got.columns.toSeq == Seq("state", "count", "percentage"))
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // 10 salvage rows total, distinct per-state counts → unique ordering
    assert(rows.toSeq == Seq(
      ("ca", 4L, 40.0),
      ("tx", 3L, 30.0),
      ("ny", 2L, 20.0),
      ("wa", 1L, 10.0)))
  }
}
