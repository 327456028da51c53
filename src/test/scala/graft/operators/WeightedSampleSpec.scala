package graft.operators

import graft.SparkTestBase

/** [[PackingOps.weightedSample]]: the sequential-Poisson priorities are
  * recomputed driver-side in plain Scala (java MessageDigest md5, integer
  * hex parse, two exact IEEE ops) and must match the engine's doubles
  * BIT-FOR-BIT — the same property the DuckDB oracle then re-proves
  * cross-engine. Plus the sampling semantics: the selected set IS the k
  * smallest priorities corpus-wide, and the size-biased inclusion
  * actually biases the sample toward long documents.
  */
class WeightedSampleSpec extends SparkTestBase {

  /** u = (first-12-md5-nibbles + 1) / 2^48 — algebraically identical to
    * the engine's nibble-term sum (Σ nib_p/16^(p+1) = v·2⁻⁴⁸, every
    * partial sum exact), so == on doubles is the correct assertion.
    */
  private def priority(docId: Long, nChars: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    val u = (v + 1).toDouble / math.pow(2.0, 48.0)
    u / (nChars + 1).toDouble
  }

  test("engine priorities match the driver-side recompute bit-for-bit " +
      "and the sample is exactly the corpus-wide k smallest") {
    val corpus = t.documents.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = corpus
      .map { case (id, nc) => (priority(id, nc), id, (nc + 1).toDouble) }
      .sortBy { case (p, id, _) => (p, id) }
      .take(100)
    val got = PackingOps.weightedSample(t, 100).collect()
      .map(r => (r.getDouble(2), r.getLong(0), r.getDouble(1)))
    assert(got.length === 100)
    got.zip(expected).foreach { case ((gp, gid, gw), (ep, eid, ew)) =>
      assert(gid === eid, s"doc order: got $gid expected $eid")
      assert(gw === ew)
      assert(gp === ep, s"priority for doc $gid: ${gp} != ${ep} (must be exact)")
    }
  }

  test("size-biased inclusion: the sample skews long") {
    val corpusMean = t.documents.agg(
      org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val sampleMean = PackingOps.weightedSample(t, 100)
      .agg(org.apache.spark.sql.functions.avg("weight")).head().getDouble(0) - 1.0
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("scale shape: global top-k plans as TakeOrderedAndProject") {
    val plan = PackingOps.weightedSample(t, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject (per-partition top-k, no global sort):\n$plan")
  }

  test("τ-threshold scale path returns EXACTLY the top-k rows") {
    // the k-in-the-millions path: sketch τ, filter, re-rank survivors.
    // Superset + re-rank must reproduce the TakeOrderedAndProject sample
    // row-for-row, priorities bit-for-bit — which is what licenses the
    // gate to share sample_weighted's oracle verbatim.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows(PackingOps.weightedSampleTau(t, 100)) ===
      rows(PackingOps.weightedSample(t, 100)))
    // a tiny k exercises the 4k/n headroom branch; the exact-equality
    // contract is k-independent
    assert(rows(PackingOps.weightedSampleTau(t, 5)) ===
      rows(PackingOps.weightedSample(t, 5)))
  }

  test("τ path: k past the corpus size degrades to the full corpus, ranked") {
    val n = t.documents.count().toInt
    val all = PackingOps.weightedSampleTau(t, n + 100).collect()
    assert(all.length === n, "over-asking must return every document")
    val ps = all.map(_.getDouble(2))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "over-asked τ sample must still come back priority-ranked")
  }

  test("τ path plan: a selective filter feeds the re-rank — no global sort " +
      "of the corpus") {
    val plan = PackingOps.weightedSampleTau(t, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"survivor re-rank should be TakeOrderedAndProject:\n$plan")
    assert(plan.contains("Filter") && plan.contains("<="),
      s"expected the τ threshold filter in the plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the τ path must not shuffle the corpus:\n$plan")
  }

  test("per-group variant: each language's rows are ITS k smallest priorities") {
    val corpus = t.documents.select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = corpus.groupBy(_._1).toSeq.flatMap { case (lang, docs) =>
      docs.toSeq.map { case (_, id, nc) => (priority(id, nc), id) }
        .sortBy { case (p, id) => (p, id) }.take(10).zipWithIndex
        .map { case ((p, id), i) => (lang, id) -> ((p, i + 1L)) }
    }.toMap
    val got = PackingOps.weightedSamplePerGroup(t, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(got.length === expected.size)
    got.foreach { case (lang, id, p, rn) =>
      val (ep, ern) = expected((lang, id))
      assert(p === ep, s"priority for ($lang, $id)")
      assert(rn === ern, s"rank for ($lang, $id)")
    }
  }

  test("per-group variant: WindowGroupLimit prunes below the exchange") {
    val plan = PackingOps.weightedSamplePerGroup(t, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side WindowGroupLimit before the lang exchange:\n$plan")
  }
}
