package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkTestBase {

  test("q1: three return flags, counts sum to lineitem count, sorted desc") {
    val rows = CoreQueries.q1GroupCountAvg(t).collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
    assert(rows.map(_.getLong(1)).sum == t.lineitem.count())
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("q2: exact median lies within group min/max") {
    val med = CoreQueries.q2MedianByPriority(t).collect()
    val bounds = t.orders
      .groupBy(upper(col("o_orderpriority")).as("priority"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    med.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi)
    }
  }

  test("q3: percentages sum to ~100") {
    val pct = CoreQueries.q3StatusShare(t).collect().map(_.getDouble(2)).sum
    assert(math.abs(pct - 100.0) < 0.1)
  }

  test("filter algebra: chained filters == conjunction (Catalyst CombineFilters)") {
    val chained = t.lineitem
      .filter(col("l_quantity") >= 10).filter(col("l_quantity") <= 40).count()
    val conj = t.lineitem
      .filter(col("l_quantity") >= 10 && col("l_quantity") <= 40).count()
    assert(chained == conj)
  }

  test("topK == head of full sort") {
    val topk = CoreQueries.topKOrders(t).collect().map(_.getLong(0)).toSeq
    val full = t.orders.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(topk == full)
  }

  test("castColumns: decimal/string casts preserve row count and null-safety") {
    val df = CoreQueries.castColumns(t)
    assert(df.count() == t.lineitem.count())
    // decimal casts are exercised inside the query; the gated output is
    // representation-stable types only (round-2: decimal result columns
    // canonicalize differently across engines/readers)
    assert(df.schema("price_2dp").dataType.typeName == "double")
    assert(df.schema("tax_str").dataType.typeName == "string")
    assert(df.filter(col("qty_int").isNull).count() == 0)
    // tax_str is decimal-derived: always exactly two fraction digits
    assert(df.filter(!col("tax_str").rlike("^[0-9]+\\.[0-9]{2}$")).count() == 0)
  }

  test("rowIdsStable: contiguous 1..n ids equal to the key's global rank") {
    val rows = CoreQueries.rowIdsStable(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    // id == rank of the unique key, independent of partitioning
    val byKey = rows.sortBy(_._1)
    assert(byKey.map(_._2).toSeq == (1L to rows.length).toSeq)
    // stable across runs (unlike monotonically_increasing_id)
    val again = CoreQueries.rowIdsStable(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.toMap == again)
  }

  test("dedupExact removes duplicates idempotently") {
    val once = CoreQueries.dedupExact(t)
    assert(once.count() == once.dropDuplicates().count())
  }

  test("q1 plan pushes column pruning to the parquet scan") {
    val plan = CoreQueries.q1GroupCountAvg(t).queryExecution.executedPlan.toString
    assert(plan.contains("l_returnflag") && plan.contains("l_extendedprice"))
    // the scan must not read unrelated wide columns
    assert(!plan.contains("l_comment"))
  }

  test("aggGlobalSum returns exactly one row") {
    assert(CoreQueries.aggGlobalSum(t).count() == 1)
  }

  test("rollup: grand total row equals table count, per-flag rows sum to it") {
    val rows = CoreQueries.aggRollup(t).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getLong(2) == t.lineitem.count())
    val perFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
    assert(perFlag == t.lineitem.count())
  }

  test("cube emits all four grouping-set combinations") {
    val rows = CoreQueries.aggCube(t).collect()
    def kinds(r: org.apache.spark.sql.Row) = (r.isNullAt(0), r.isNullAt(1))
    assert(rows.map(kinds).toSet == Set((false, false), (false, true), (true, false), (true, true)))
  }

  test("grouping sets: status slice + priority slice + grand total, flags disambiguate") {
    val rows = CoreQueries.aggGroupingSets(t).collect()
    val nStatus = t.orders.select("o_orderstatus").distinct().count()
    val nPrio   = t.orders.select("o_orderpriority").distinct().count()
    assert(rows.length == nStatus + nPrio + 1)
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1 && grand.head.getLong(4) == t.orders.count())
    val byStatus = rows.filter(r => r.getLong(2) == 0)
    assert(byStatus.forall(r => r.isNullAt(1) && r.getLong(3) == 1))
    val want = t.orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byStatus.foreach(r => assert(r.getLong(4) == want(r.getString(0))))
    assert(byStatus.map(_.getLong(4)).sum == t.orders.count())
  }

  test("collect_sorted, exact percentiles, and max_by match brute force") {
    val statuses = CoreQueries.aggCollectSorted(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val bruteStatuses = t.lineitem.select("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.mkString(",")).toMap
    assert(statuses == bruteStatuses)

    val p = CoreQueries.aggExactPercentiles(t).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    def pct(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted; val pos = (s.length - 1) * q
      val (lo, f) = (pos.toInt, pos - pos.toInt)
      val v = if (lo + 1 < s.length) s(lo) * (1 - f) + s(lo + 1) * f else s(lo)
      math.floor(v * 1e4 + 0.5) / 1e4
    }
    t.orders.select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .foreach { case (prio, vs) =>
        val xs = vs.map(_._2)
        val (p50, p90, n) = p(prio)
        assert(n == xs.length)
        assert(math.abs(p50 - pct(xs, 0.5)) <= 1e-4, s"$prio p50")
        assert(math.abs(p90 - pct(xs, 0.9)) <= 1e-4, s"$prio p90")
      }

    val mb = CoreQueries.aggMaxBy(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    t.orders.select("o_orderstatus", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
      .foreach { case (st, vs) =>
        val top = vs.maxBy(v => (v._3, v._2))
        assert(mb(st) == ((top._2, top._3)), s"status $st")
      }
  }

  test("unpivot inverts pivot back to the long form exactly") {
    import graft.functions.NumericFunctions.roundN
    val got = CoreQueries.unpivotFlagStatus(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val want = t.lineitem
      .filter(col("l_returnflag").isin("A", "N", "R"))
      .groupBy("l_linestatus", "l_returnflag")
      .agg(roundN(sum("l_quantity"), 2).as("sum_qty"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("count-min sketch: never under-counts, stays within eps*N, deterministic") {
    val n = t.lineitem.count()
    val exact = t.lineitem.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = CoreQueries.sketchCmsEstimates(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 20)
    got.foreach { case (pk, est) =>
      assert(est >= exact(pk), s"CMS under-estimated $pk: $est < ${exact(pk)}")
      assert(est <= exact(pk) + math.ceil(0.001 * n).toLong + 1,
        s"CMS estimate $est for $pk above exact + eps*N")
    }
    val again = CoreQueries.sketchCmsEstimates(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == got.toSeq)
    // hash-gated face: exact top-20 counts with both bound verdicts true,
    // consistent with the raw estimates above
    val gate = CoreQueries.sketchCmsTopK(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(gate.length == 20)
    gate.foreach { case (pk, ne, neverUnder, withinBound) =>
      assert(ne == exact(pk))
      assert(neverUnder && withinBound)
    }
  }

  test("typed groupByKey/mapGroups equals the untyped aggregate") {
    val typed = TypedOps.customerOrderStats(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val untyped = t.orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("o_custkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(typed.toSeq == untyped.toSeq)
    assert(typed.nonEmpty)
  }

  test("approx distinct within rsd bound of exact") {
    val exact = CoreQueries.aggCountDistinct(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = CoreQueries.aggApproxDistinct(t).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), "n_exact must be exact")
      assert(r.getBoolean(2), s"HLL sketch outside 6·rsd band for '${r.getString(0)}'")
    }
  }

  test("seeded sample: fraction bounds and seed stability") {
    val n = t.orders.count().toDouble
    val s1 = CoreQueries.sampleOrders(t)
    val c1 = s1.count()
    assert(c1 > n * 0.05 && c1 < n * 0.15)
    val c2 = CoreQueries.sampleOrders(t).count()
    assert(c1 == c2) // same seed + same partition layout
  }

  test("randomSplit partitions the table") {
    val rows = CoreQueries.splitCounts(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("train") + rows("test") == t.orders.count())
    assert(rows("train") > rows("test"))
  }

  test("pivot cells match the long-format multi-key aggregation") {
    val wide = CoreQueries.pivotFlagStatus(t).collect()
      .flatMap { r =>
        Seq("A" -> 1, "N" -> 2, "R" -> 3).flatMap { case (f, i) =>
          if (r.isNullAt(i)) None else Some((f, r.getString(0)) -> r.getDouble(i))
        }
      }.toMap
    val long = CoreQueries.aggMultiKeyAvg(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(wide == long)
  }

  test("corr in [-1,1]; covar consistent with corr * sd products") {
    val r = CoreQueries.statCorrCovar(t).head()
    val c = r.getDouble(0)
    assert(c >= -1.0 && c <= 1.0)
    val sds = t.lineitem.agg(
      stddev_samp("l_quantity"), stddev_samp("l_extendedprice")).head()
    val expected = c * sds.getDouble(0) * sds.getDouble(1)
    assert(math.abs(r.getDouble(1) - expected) / math.max(1.0, math.abs(expected)) < 0.01)
  }

  test("stratified sample respects per-stratum fractions") {
    val totals = t.orders.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = Map("F" -> 0.05, "O" -> 0.05, "P" -> 0.5)
    CoreQueries.stratifiedSampleCounts(t).collect().foreach { r =>
      val got = r.getLong(1).toDouble / totals(r.getString(0))
      val want = fracs(r.getString(0))
      assert(got > want * 0.3 && got < want * 2.5,
        s"stratum ${r.getString(0)}: got fraction $got, want ~$want")
    }
    // and the gate's own verdict agrees: every stratum inside its 6σ band
    CoreQueries.stratifiedSample(t).collect().foreach { r =>
      assert(r.getLong(1) == totals(r.getString(0)), "n_source must be exact")
      assert(r.getBoolean(2), s"stratum ${r.getString(0)} out of band")
    }
  }

  test("heavy hitters equal a manual count-sort") {
    val got = CoreQueries.topPartKeys(t, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val manual = t.lineitem.groupBy("l_partkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, n) => (-n, k) }.take(5).toSeq
    assert(got == manual)
  }

  test("monotonically increasing ids are unique") {
    val df = CoreQueries.rowIds(t)
    assert(df.select("row_id").distinct().count() == df.count())
  }

  test("q2 default-accuracy approx median: group element within the GK rank bound") {
    val eps = 1.0 / 10000 // ε = 1/accuracy, percentile_approx's documented bound
    val rows = CoreQueries.q2ApproxMedianDefault(t).collect()
    val groups = t.orders.select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(rows.nonEmpty && rows.length == groups.size)
    rows.foreach { r =>
      val vs = groups(r.getString(0))
      val n = vs.length
      assert(r.getLong(1) == n)
      val v = r.getDouble(2)
      assert(vs.contains(v), s"approx median $v is not an element of the group")
      // the value's rank interval [below+1, atOrBelow] must intersect
      // the ε-window around the target rank 0.5·n
      val below = vs.count(_ < v)
      val atOrBelow = vs.count(_ <= v)
      val loRank = (0.5 - eps) * n - 1
      val hiRank = (0.5 + eps) * n + 1
      assert(below + 1 <= hiRank && atOrBelow >= loRank,
        s"rank interval [${below + 1}, $atOrBelow] outside ε-bound [$loRank, $hiRank] (n=$n)")
    }
  }

  test("hash split: exact partition, correct bucket fences, ~80/10/10 shares") {
    val assigned = CoreQueries.hashSplitAssign(t.documents, "doc_id")
    val n = t.documents.count()
    assert(assigned.count() == n, "assignment must not drop or add rows")
    val rows = CoreQueries.hashSplitGate(t).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum == n)
    // bucket fences are hard boundaries, not tendencies
    assert(rows("train").getAs[Int]("min_bucket") >= 0 &&
      rows("train").getAs[Int]("max_bucket") <= 204)
    assert(rows("val").getAs[Int]("min_bucket") >= 205 &&
      rows("val").getAs[Int]("max_bucket") <= 229)
    assert(rows("test").getAs[Int]("min_bucket") >= 230 &&
      rows("test").getAs[Int]("max_bucket") <= 255)
    // binomial 6σ bands around the target shares (p=205/256, 25/256, 26/256)
    def inBand(k: Long, p: Double): Boolean =
      math.abs(k - n * p) <= 6 * math.sqrt(n * p * (1 - p)) + 1
    assert(inBand(rows("train").getAs[Long]("n_docs"), 205.0 / 256))
    assert(inBand(rows("val").getAs[Long]("n_docs"), 25.0 / 256))
    assert(inBand(rows("test").getAs[Long]("n_docs"), 26.0 / 256))
  }

  test("hash-stratified sample: exactly k per stratum, deterministic, partial top-k plan") {
    val k = 5
    val rows = CoreQueries.hashStratifiedSample(t, k).collect()
    val perSource = rows.groupBy(_.getString(0))
    val nSources = t.documents.select("source").distinct().count()
    assert(perSource.size == nSources)
    perSource.values.foreach { g =>
      assert(g.length == k)
      assert(g.map(_.getInt(3)).sorted.toSeq == (1 to k))
    }
    // rerun: identical rows (no RNG state anywhere)
    val again = CoreQueries.hashStratifiedSample(t, k).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // rank filter pushed below the exchange: partial per-partition top-k
    val plan = CoreQueries.hashStratifiedSample(t, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("hash split is deterministic and insertion-stable (a doc's split never changes)") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val full = CoreQueries.hashSplitAssign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // rerun: identical (no RNG state)
    val again = CoreQueries.hashSplitAssign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full == again)
    // assign over HALF the corpus: every shared doc keeps its split —
    // the property randomSplit cannot give (its assignment depends on
    // partition layout and the rows around each row)
    val half = CoreQueries.hashSplitAssign(
      docs.filter($"doc_id" <= 250), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("split-distribution KS: gaps recompute from the raw assignments; hash split stays representative") {
    import spark.implicits._
    val rows = CoreQueries.splitDistributionKs(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 9))
    val assigned = CoreQueries.hashSplitAssign(t.documents, "doc_id")
      .filter(col("split").isin("train", "test"))
      .select("split", "n_chars").as[(String, Long)].collect()
    val tr = assigned.filter(_._1 == "train").map(_._2)
    val te = assigned.filter(_._1 == "test").map(_._2)
    val (mn, mx) = {
      val all = tr ++ te; (all.min, all.max)
    }
    rows.foreach { case (k, g, cTr, cTe, ppm) =>
      assert(g == mn + (mx - mn) * k / 10)
      assert(cTr == tr.count(_ <= g).toLong && cTe == te.count(_ <= g).toLong)
      val expectPpm = math.abs(cTr * te.length - cTe * tr.length) * 1000000L /
        (tr.length.toLong * te.length)
      assert(ppm == expectPpm)
      assert(ppm <= 1000000L)
    }
    // a hash split of an unordered corpus is representative: the max gap
    // stays far under the ~sqrt(1/n) KS scale blowing up
    assert(rows.map(_._5).max < 250000L,
      s"train/test length distributions diverge: ${rows.map(_._5).max} ppm")
  }
}
