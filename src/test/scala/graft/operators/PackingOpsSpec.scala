package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

class PackingOpsSpec extends SparkTestBase {

  private def tokenFrame = t.documents.select(
    col("doc_id"),
    size(tokens(col("text"))).cast(LongType).as("n_tok"))

  test("exclusiveRunningTotal == naive single-partition window, any partitioning") {
    val naive = tokenFrame
      .withColumn("cum0",
        sum("n_tok").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (parts <- Seq("3", "17")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val got = PackingOps.exclusiveRunningTotal(tokenFrame, "doc_id", "n_tok", "cum0")
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(got == naive, s"running total diverged at $parts partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("packConcatChunks: bins are contiguous and conserve the corpus exactly") {
    val bins = PackingOps.packConcatChunks(t, 1024).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalTokens = tokenFrame.agg(sum("n_tok")).collect()(0).getLong(0)
    assert(bins.map(_._3).sum == totalTokens, "token totals must conserve")
    assert(bins.map(_._2).sum == t.documents.count(), "doc counts must conserve")
    assert(bins.map(_._1).toSeq == (0L until bins.length).toSeq, "bin ids contiguous from 0")
    // every bin holds at least one document's start; a bin's token total
    // can exceed 1024 only by the tail of its last (straddling) document
    val maxDoc = tokenFrame.agg(max("n_tok")).collect()(0).getLong(0)
    bins.dropRight(1).foreach { case (id, _, tok) =>
      assert(tok > 1024 - maxDoc, s"bin $id implausibly small ($tok tokens)")
    }
  }

  test("exclusiveRunningTotalPerGroup == partitioned window, group-spanning partitions") {
    val src = t.documents.select(
      col("doc_id"), col("source"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"),
      md5(col("doc_id").cast(StringType)).as("k"))
    val naive = src
      .withColumn("cum0",
        sum("n_tok").over(Window.partitionBy("source").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // 29 range partitions over 20 sources forces several groups to span a
    // partition boundary — the case the per-group offsets must get right
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "29")
    try {
      val got = PackingOps
        .exclusiveRunningTotalPerGroup(src, "source", "k", "n_tok", "cum0")
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      assert(got == naive)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sampleMixture: per-source budgets honored independently") {
    val got = PackingOps.sampleMixture(t, 600).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = got.groupBy(_._2)
    assert(bySource.size == t.documents.select("source").distinct().count(),
      "every source must contribute")
    bySource.foreach { case (src, docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      // stop-after-crossing per source: under budget before the crossing
      // doc, never more than one doc over
      assert(total < 600 + maxDoc, s"$src over budget: $total")
      assert(total >= 600 - maxDoc || docs.length == 25,
        s"$src implausibly under budget: $total")
    }
  }

  test("sampleMixtureTemperature: sqrt budgets recomputed driver-side; low-resource sources up-weighted") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    // driver-side budget recompute from the raw per-source token totals
    val totals = t.documents
      .groupBy("source").agg(sum(size(tokens(col("text"))).cast("long")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = totals.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong }
    val sv = v.values.sum
    val expectBudget = v.map { case (s, vi) =>
      s -> math.floor((vi * 8000L).toDouble / sv.toDouble).toLong }
    val got = PackingOps.sampleMixtureTemperature(t, 8000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gotBudgets = got.map(r => r._2 -> r._4).toMap
    gotBudgets.foreach { case (s, b) =>
      assert(b == expectBudget(s), s"budget mismatch for $s") }
    // flooring loses at most one token per source
    assert(expectBudget.values.sum <= 8000L &&
      expectBudget.values.sum > 8000L - expectBudget.size)
    // the defining temperature property: every below-average source's
    // weight SHARE strictly exceeds its raw token share (sqrt flattens
    // toward uniform; n < mean ⇒ n < (T/Σ√n)² by Cauchy–Schwarz, so the
    // claim is exact on the micro-weights, no floor noise)
    val tokSum = totals.values.sum.toDouble
    totals.foreach { case (s, n) =>
      val rawShare = n / tokSum
      val wShare = v(s).toDouble / sv
      if (n.toDouble < tokSum / totals.size)
        assert(wShare > rawShare, s"$s should be up-weighted")
    }
    // the draw itself honors each source's budget (stop-after-crossing)
    got.groupBy(_._2).foreach { case (src, docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      assert(total < gotBudgets(src) + maxDoc, s"$src over budget: $total")
    }
  }

  test("sampleTokenBudget: prefix-closed in md5 order and within budget") {
    val got = PackingOps.sampleTokenBudget(t, 8000).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent formulation: naive window cumsum over the md5 order
    val naive = t.documents
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tok"),
        md5(col("doc_id").cast(StringType)).as("k"))
      .withColumn("cum0",
        sum("n_tok").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .filter(col("cum0") < 8000)
      .select("doc_id", "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty && got.length < t.documents.count(),
      "budget must select a strict, non-empty subset at fixture scale")
    // stop-after-crossing: total minus the crossing doc stays under budget
    val total = got.map(_._2).sum
    assert(total >= 8000 - got.map(_._2).max && total < 8000 + got.map(_._2).max)
  }

  test("sampleTokenBudgetEncoded: prefix-closed on ENCODED counts, strict subset, counts match the encoder") {
    val budget = 40000L
    val got = PackingOps.sampleTokenBudgetEncoded(t, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent formulation: the per-doc encoded counts through a naive
    // window cumsum over the md5 order
    val enc = TextOps.bpeEncodedDocTokens(t)
    val naive = enc
      .select(col("doc_id"), col("n_tok"),
        md5(col("doc_id").cast(StringType)).as("k"))
      .withColumn("cum0",
        sum("n_tok").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .filter(col("cum0") < budget)
      .select("doc_id", "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty && got.length < t.documents.count(),
      "encoded budget must select a strict, non-empty subset at fixture scale")
    // the sampler's counts ARE the encoder's (no drift between the two
    // derivations of the same dict)
    val encMap = enc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, n) => assert(encMap(id) == n, s"doc $id count") }
    // encoded counts exceed whitespace counts (5 merges leave most chars
    // unmerged) — the reason the encoded-budget twin exists
    val words = PackingOps.sampleTokenBudget(t, Long.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, n) => n >= words(id) })
  }

  test("shardManifest: conserves the corpus, shards within range, balanced, partition-invariant") {
    val m = PackingOps.shardManifest(t, 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.forall(s => s._1 >= 0 && s._1 < 8), "shard ids in [0, 8)")
    assert(m.map(_._2).sum == t.documents.count(), "doc counts must conserve")
    assert(m.map(_._3).sum ==
      tokenFrame.agg(sum("n_tok")).head().getLong(0), "token totals must conserve")
    assert(m.map(_._4).sum ==
      t.documents.agg(sum("n_chars")).head().getLong(0), "char totals must conserve")
    // md5 uniformity: no shard may hog the corpus (binomial bound is far
    // tighter; 3x mean is a regression tripwire, not a statistics test)
    val mean = t.documents.count().toDouble / 8
    assert(m.forall(_._2 <= mean * 3), s"a shard hogs the corpus: ${m.toSeq}")
    // assignment is a pure row-local hash: any partitioning, same manifest
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "17")
    try {
      val again = PackingOps.shardManifest(t, 8).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(again.toSeq == m.toSeq, "manifest must be partitioning-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // non-power-of-two shard counts are rejected (floor(shards*u) is only
    // engine-exact when the multiply is an exponent shift)
    intercept[IllegalArgumentException] { PackingOps.shardManifest(t, 6) }
  }

  test("checkpoint knob: identical totals, lineage truncated at the checkpoint") {
    val tk = t.documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"))
    val plain = PackingOps.exclusiveRunningTotal(tk, "doc_id", "n_tok", "cum0")
    val ckpt  = PackingOps.exclusiveRunningTotal(tk, "doc_id", "n_tok", "cum0",
      checkpoint = true)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cum0").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(ckpt) == asMap(plain))
    // with the knob on, both passes hang off a materialized checkpoint —
    // the arranged lineage (scan→tokenize→exchange→sort) is gone from the
    // physical lineage; without it, the exchange is still there
    assert(ckpt.rdd.toDebugString.contains("CheckpointRDD"))
    assert(!plain.rdd.toDebugString.contains("CheckpointRDD"))

    val grouped = t.documents.select(
      col("doc_id"), col("source"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"))
    val gPlain = PackingOps.exclusiveRunningTotalPerGroup(
      grouped, "source", "doc_id", "n_tok", "cum0")
    val gCkpt = PackingOps.exclusiveRunningTotalPerGroup(
      grouped, "source", "doc_id", "n_tok", "cum0", checkpoint = true)
    assert(asMap(gCkpt) == asMap(gPlain))
    assert(gCkpt.rdd.toDebugString.contains("CheckpointRDD"))
  }
}
