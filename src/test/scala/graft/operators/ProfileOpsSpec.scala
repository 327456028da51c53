package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("histogram matches a driver-side bucketing of the same rows") {
    val prices = t.orders.select(col("o_totalprice").cast("double"))
      .as[Double].collect()
    val (mn, mx) = (prices.min, prices.max)
    val width = (mx - mn) / 10
    val expect = prices.groupBy(p =>
      math.min(math.floor((p - mn) / width), 9.0).toInt)
      .map { case (b, vs) => b -> (vs.length.toLong, vs.min, vs.max) }
    val got = ProfileOps.priceHistogram(t).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (b, (n, lo, hi)) =>
      assert(got(b) == ((n, lo, hi)), s"bucket $b: ${got(b)} vs ($n,$lo,$hi)")
    }
    assert(got.values.map(_._1).sum == prices.length)
    // bucket extents nest inside the global extent and ascend
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, (_, _, hi1)), (_, (_, lo2, _))) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("histogram on a constant column degenerates to one bucket holding everything") {
    val const = Seq.fill(40)(7.5).toDF("v")
    val rows = ProfileOps.histogram(const, "v").collect()
    // (x-mn)/((mx-mn)/10) is 0/0 = NaN; floor(NaN) stays NaN and least
    // propagates it — the degenerate-extent case must still count all rows
    assert(rows.map(_.getLong(1)).sum == 40)
    assert(rows.length == 1)
  }

  test("analyze stats equal direct per-column recomputes") {
    val rows = ProfileOps.analyzeOrders(t).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice"))
    val n = t.orders.count()
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
      "o_totalprice").foreach { c =>
      assert(rows(c).getAs[Long]("n_distinct") ==
        t.orders.select(c).na.drop().distinct().count(), s"$c ndv")
      assert(rows(c).getAs[Long]("n_nulls") ==
        t.orders.filter(col(c).isNull).count(), s"$c nulls")
    }
    val d = t.orders.agg(min("o_orderkey").cast("long"),
      max("o_orderkey").cast("long"),
      min("o_totalprice").cast("double"), max("o_totalprice").cast("double"))
      .head()
    assert(rows("o_orderkey").getAs[Long]("min_long") == d.getLong(0))
    assert(rows("o_orderkey").getAs[Long]("max_long") == d.getLong(1))
    assert(rows("o_totalprice").getAs[Double]("min_double") == d.getDouble(2))
    assert(rows("o_totalprice").getAs[Double]("max_double") == d.getDouble(3))
    // typed pairs stay null off their type
    assert(rows("o_orderstatus").isNullAt(
      rows("o_orderstatus").fieldIndex("min_long")))
    assert(rows("o_orderkey").isNullAt(
      rows("o_orderkey").fieldIndex("min_double")))
  }

  test("cms join-size: never under, within bound, and exact term equals the real join") {
    val raw = ProfileOps.cmsJoinSizeEstimates(t).head()
    val exact = raw.getAs[Long]("exact_size")
    val est = raw.getAs[Long]("est_size")
    val realJoin = t.lineitem.join(t.part,
      col("l_partkey") === col("p_partkey")).count()
    assert(exact == realJoin, s"frequency dot product $exact != join $realJoin")
    assert(est >= exact, s"CMS under-counted: $est < $exact")
    val slack = ProfileOps.cmsJoinSlack(raw.getAs[Long]("n_left"),
      raw.getAs[Long]("n_right"), ProfileOps.cmsJoinWidth)
    assert(est <= exact + slack, s"est $est above exact $exact + slack $slack")
    info(s"exact=$exact est=$est (overshoot ${est - exact}, slack bound ${slack.toLong})")
  }

  test("cms join-size: disjoint keys estimate ~0; a hot key dominates the estimate") {
    import spark.implicits._
    val a = (1L to 2000L).map(i => Tuple1(i)).toDF("k")
    val b = (100001L to 102000L).map(i => Tuple1(i)).toDF("k")
    val disjoint = ProfileOps.cmsJoinSizeRaw(a, "k", b, "k", 5, 65536)
      .head().getLong(0)
    // collisions can add a little, but 2000×2000 keys over 65536 buckets
    // across 5 independent rows leaves the min near zero
    assert(disjoint <= 1000L, s"disjoint-key estimate $disjoint too high")
    // one key appearing 500× on the left and 40× on the right ⇒ join
    // size 20000 dwarfs everything else; the estimate must see it
    val hotA = a.union(Seq.fill(500)(7L).map(Tuple1(_)).toDF("k"))
    val hotB = b.union(Seq.fill(40)(7L).map(Tuple1(_)).toDF("k"))
    val est = ProfileOps.cmsJoinSizeRaw(hotA, "k", hotB, "k", 5, 65536)
      .head().getLong(0)
    assert(est >= 20000L && est <= 25000L,
      s"hot-key join estimate $est far from true 20000")
  }

  test("cms sketch table: counts sum to depth × rows, buckets in range") {
    val sk = ProfileOps.cmsTable(t.part, "p_partkey", 5, 1024)
    val total = sk.agg(sum("cnt")).head().getLong(0)
    assert(total == 5L * t.part.count())
    val bad = sk.filter(col("bucket") < 0 || col("bucket") >= 1024).count()
    assert(bad == 0L)
  }

  test("join-skew report: contributions equal the true self-join group sizes") {
    val got = ProfileOps.joinSkewTopK(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val freq = t.events.filter(col("user_id").isNotNull)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val expect = freq.toSeq.map { case (u, n) => (u, n, n * n) }
      .sortBy { case (u, _, c) => (-c, u) }.take(10)
    assert(got.toSeq == expect)
    // each contribution IS that key's self-join output size
    val hot = got.head._1
    val selfJoin = t.events.filter(col("user_id") === hot).count()
    assert(got.head._3 == selfJoin * selfJoin)
  }

  test("analyze runs as ONE scan of orders") {
    val plan = ProfileOps.analyzeOrders(t).queryExecution.executedPlan.toString
    val scans = "orders\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 orders scan, got $scans")
  }

  test("incremental stats: maintained == direct over base ∪ inserts, and the base is never rescanned twice") {
    val row = ProfileOps.incrementalColumnStats(t).head()
    val direct = {
      val base = t.documents.select(col("source"), col("n_chars"))
      val ins = t.documents.filter(col("doc_id") % 13 === 0)
        .select(col("source"), length(col("text")).cast("long").as("n_chars"))
      base.unionByName(ins).agg(
        count(lit(1)), min(col("n_chars")), max(col("n_chars")),
        min(col("source")), max(col("source"))).head()
    }
    assert(row.getAs[Long]("n_rows") == direct.getLong(0))
    assert(row.getAs[Long]("min_chars") == direct.getLong(1))
    assert(row.getAs[Long]("max_chars") == direct.getLong(2))
    assert(row.getAs[String]("min_source") == direct.getString(3))
    assert(row.getAs[String]("max_source") == direct.getString(4))
    assert(row.getAs[Long]("n_nulls_chars") == 0L &&
      row.getAs[Long]("n_nulls_source") == 0L)
  }

  test("incremental stats: an EMPTY insert batch leaves every stat unchanged (not nulled)") {
    import org.apache.spark.sql.types._
    // hand-built: base with a null n_chars; empty insert side exercised
    // through the same statsRow+combine path via a filtered empty feed
    val base = Seq(("a", Some(5L)), ("b", None: Option[Long]), ("c", Some(9L)))
      .toDF("source", "n_chars")
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("n_chars", LongType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // replicate the gate's combine over hand-built frames
    val b = ProfileOps.statsRow(base).head()
    val e = ProfileOps.statsRow(empty).head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(2) && e.isNullAt(3))
    assert(b.getLong(0) + e.getLong(0) == 3L)
    assert(b.getLong(1) + e.getLong(1) == 1L, "null count must add 0, not null")
  }
}
