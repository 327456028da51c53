package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot reconciliation ([[SnapshotOps]]): exact statuses on a
  * hand-built pair, the conservation laws on the fixture-derived gate, and
  * the digests-only shuffle contract.
  */
class SnapshotOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-built snapshots: every status assigned exactly as defined") {
    val a = Seq((1L, "s", "alpha"), (2L, "s", "beta"), (3L, "s", "gamma"))
      .toDF("doc_id", "source", "text")
    val b = Seq((2L, "s", "beta"), (3L, "s", "GAMMA"), (4L, "s", "delta"))
      .toDF("doc_id", "source", "text")
    val got = SnapshotOps.snapshotDiff(a, b)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("fixture diff honors the conservation laws of the synthetic snapshot B") {
    val docs = t.documents.select("doc_id").as[Long].collect().toSet
    val rows = SnapshotOps.snapshotDiff(
      t.documents.select("doc_id", "source", "text"),
      SnapshotOps.syntheticSnapshotB(t)).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // every doc of A ∪ B labelled exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    val byStatus = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    // removed = exactly the %7 == 0 docs (removal wins over the %11 change)
    assert(byStatus.getOrElse("removed", Set()) == docs.filter(_ % 7 == 0))
    // added = exactly the shifted %13 == 0 docs
    assert(byStatus.getOrElse("added", Set()) ==
      docs.filter(_ % 13 == 0).map(_ + (1L << 40)))
    // changed ⊆ surviving %11 == 0 docs (uppercasing no-letter text is a
    // digest no-op, so ⊆ not ==), and nothing else may change
    val changed = byStatus.getOrElse("changed", Set())
    assert(changed.subsetOf(docs.filter(d => d % 11 == 0 && d % 7 != 0)))
    assert(changed.nonEmpty, "fixture should contain at least one real change")
    // everything else is unchanged
    assert(byStatus.getOrElse("unchanged", Set()) ==
      docs.filter(d => d % 7 != 0 && !changed(d)) ++ Set())
  }

  test("mergeApply: insert/update/delete each land; fixture merge reconstructs snapshot B row-for-row") {
    val base = Seq((1L, "s", "alpha"), (2L, "s", "beta"), (3L, "s", "gamma"))
      .toDF("doc_id", "source", "text")
    val changes = Seq(
      (2L, "delete", "s", "beta"),
      (3L, "update", "s", "GAMMA"),
      (4L, "insert", "s", "delta"))
      .toDF("doc_id", "op", "source", "text")
    val got = SnapshotOps.mergeApply(base, changes)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == Map(1L -> "alpha", 3L -> "GAMMA", 4L -> "delta"))
    // self-proof at fixture scale: applying the derived diff to A yields
    // exactly B (both directions of exceptAll empty)
    val a = t.documents.select("doc_id", "source", "text")
    val b = SnapshotOps.syntheticSnapshotB(t)
    val merged = SnapshotOps.mergeApply(a, SnapshotOps.syntheticChanges(t))
    assert(merged.exceptAll(b).isEmpty && b.exceptAll(merged).isEmpty)
  }

  test("compactChanges: the op-composition table, pair by pair") {
    // f1 then f2 over base {1:a, 2:b, 3:c, 5:e}; key 4 inserted then
    // deleted (must vanish), key 5 deleted then re-inserted (must become
    // an update with the new payload), key 6 inserted then updated (must
    // stay an insert carrying f2's payload)
    val f1 = Seq(
      (1L, "update", "s", "a2"),
      (2L, "delete", "s", null.asInstanceOf[String]),
      (4L, "insert", "s", "d1"),
      (5L, "delete", "s", null.asInstanceOf[String]),
      (6L, "insert", "s", "f1")).toDF("doc_id", "op", "source", "text")
    val f2 = Seq(
      (1L, "delete", "s", null.asInstanceOf[String]),
      (3L, "update", "s", "c2"),
      (4L, "delete", "s", null.asInstanceOf[String]),
      (5L, "insert", "s", "e2"),
      (6L, "update", "s", "f2")).toDF("doc_id", "op", "source", "text")
    val net = SnapshotOps.compactChanges(f1, f2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(net(1L)._1 == "delete")          // update∘delete
    assert(net(2L) == (("delete", null)))   // f1 only
    assert(net(3L) == (("update", "c2")))   // f2 only
    assert(net(4L)._1 == "delete")          // insert∘delete → no-op delete
    assert(net(5L) == (("update", "e2")))   // delete∘insert → update
    assert(net(6L) == (("insert", "f2")))   // insert∘update → insert, f2 payload
    // applying the net feed equals applying sequentially
    val base = Seq((1L, "s", "a"), (2L, "s", "b"), (3L, "s", "c"),
      (5L, "s", "e")).toDF("doc_id", "source", "text")
    val seqApply = SnapshotOps.mergeApply(SnapshotOps.mergeApply(base, f1), f2)
    val netApply = SnapshotOps.mergeApply(base,
      SnapshotOps.compactChanges(f1, f2))
    assert(seqApply.exceptAll(netApply).isEmpty &&
      netApply.exceptAll(seqApply).isEmpty)
  }

  test("fixture two-hop self-proof: sequential and compacted applies both reconstruct snapshot C") {
    val a = t.documents.select("doc_id", "source", "text")
    val c = SnapshotOps.syntheticSnapshotC(t)
    val seqApply = SnapshotOps.mergeApply(
      SnapshotOps.mergeApply(a, SnapshotOps.syntheticChanges(t)),
      SnapshotOps.syntheticChanges2(t))
    assert(seqApply.exceptAll(c).isEmpty && c.exceptAll(seqApply).isEmpty)
    val netApply = SnapshotOps.mergeApply(a, SnapshotOps.compactChanges(
      SnapshotOps.syntheticChanges(t), SnapshotOps.syntheticChanges2(t)))
    assert(netApply.exceptAll(c).isEmpty && c.exceptAll(netApply).isEmpty)
    // and the maintained rollup refreshed through both hops equals the
    // direct rollup of C, bit for bit
    val maintained = SnapshotOps.incrementalRollupMultiGate(t)
    val direct = SnapshotOps.rollupStats(c).orderBy("source")
    assert(maintained.exceptAll(direct).isEmpty &&
      direct.exceptAll(maintained).isEmpty)
  }

  test("checkpoint: the stored base equals snapshot B, and the post-expiry chain reconstructs C") {
    // the materialized checkpoint IS snapshot B, row for row — the
    // lossless-write half of the expiry theorem
    val b = SnapshotOps.syntheticSnapshotB(t)
    val stored = spark.read.parquet(SnapshotOps.checkpointDir(t))
      .select("doc_id", "source", "text")
    assert(stored.exceptAll(b).isEmpty && b.exceptAll(stored).isEmpty)
    // applying Δ₂ to the stored checkpoint reconstructs C exactly — the
    // read path after v0 and Δ₁ have been expired
    val c = SnapshotOps.syntheticSnapshotC(t)
    val viaCheckpoint = SnapshotOps.mergeApply(
      stored, SnapshotOps.syntheticChanges2(t))
    assert(viaCheckpoint.exceptAll(c).isEmpty &&
      c.exceptAll(viaCheckpoint).isEmpty)
    // and the gate's rollup equals the multibatch gate's (same oracle)
    val g1 = SnapshotOps.checkpointedApplyRoundtrip(t)
    val g2 = SnapshotOps.multibatchApplyRoundtrip(t)
    assert(g1.exceptAll(g2).isEmpty && g2.exceptAll(g1).isEmpty)
  }

  test("incrementalRollup: every CDC op contributes its signed deltas, including cross-source moves") {
    val a = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"),
      (4L, "s2", "delta"), (5L, "s3", "only"))
      .toDF("doc_id", "source", "text")
    val changes = Seq(
      // update in place (text changes → chars + digest move)
      (1L, "update", "s1", "ALPHA-LONGER", "s1", "alpha"),
      // cross-source move: s1 loses the doc, s2 gains it
      (2L, "update", "s2", "beta", "s1", "beta"),
      // delete the only doc of s3 — the source must vanish from the rollup
      (5L, "delete", null, null, "s3", "only"),
      // insert under a source the old rollup never saw
      (6L, "insert", "s4", "fresh", null, null))
      .toDF("doc_id", "op", "source", "text", "prev_source", "prev_text")
    val got = SnapshotOps.incrementalRollup(SnapshotOps.rollupStats(a), changes)
    // ground truth: roll up the reconstructed snapshot directly
    val direct = SnapshotOps.rollupStats(SnapshotOps.mergeApply(a, changes))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty,
      s"incremental ${got.collect().mkString(",")} vs direct ${direct.collect().mkString(",")}")
    val sources = got.select("source").as[String].collect().toSet
    assert(sources == Set("s1", "s2", "s4"), s"got sources $sources")
  }

  test("fixture self-proof: maintained rollup equals a direct rollup of snapshot B, bit for bit") {
    val got = SnapshotOps.incrementalRollupGate(t)
    val direct = SnapshotOps.rollupStats(SnapshotOps.syntheticSnapshotB(t))
    // compare names + types (nullability legitimately differs: the
    // coalesce-based maintenance arithmetic is provably non-null)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)),
      s"maintained schema ${got.schema} differs from direct ${direct.schema}")
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("the maintenance path never scans the base corpus' text at merge time") {
    // the delta side reads only the changes feed; the join input sizes are
    // per-source rollup rows + |changes| — assert no exchange in the final
    // join carries the corpus' text column
    val a = t.documents.select("doc_id", "source", "text")
    val changes = SnapshotOps.syntheticChangesWithImages(t)
    val refreshed = SnapshotOps.incrementalRollup(SnapshotOps.rollupStats(a), changes)
    val inputs = exchangeInputs(refreshed)
    assert(inputs.nonEmpty)
    inputs.foreach { in =>
      assert(!in.contains("text#"),
        s"rollup maintenance shuffles document text: $in")
    }
  }

  test("null-text documents diff by presence, not digest nullness") {
    val a = Seq((1L, "s", Option.empty[String]), (2L, "s", Option("x")),
      (3L, "s", Option.empty[String]), (4L, "s", Option.empty[String]))
      .toDF("doc_id", "source", "text")
    val b = Seq((1L, "s", Option.empty[String]), (2L, "s", Option("x")),
      (3L, "s", Option("now text")), (5L, "s", Option.empty[String]))
      .toDF("doc_id", "source", "text")
    val got = SnapshotOps.snapshotDiff(a, b)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", // null text both sides: present + equal
      2L -> "unchanged",
      3L -> "changed",   // null -> text IS a change
      4L -> "removed",   // null-text doc genuinely gone
      5L -> "added"),    // null-text doc genuinely new
      s"got $got")
    // and a merge of the derived feed still reconstructs B, including
    // the null-text rows an update-to-null must not resurrect
    val changes = got.filterNot(_._2 == "unchanged").toSeq.map {
      case (id, "removed") => (id, "delete", Option.empty[String], Option.empty[String])
      case (3L, _) => (3L, "update", Option("s"), Option("now text"))
      case (5L, _) => (5L, "insert", Option("s"), Option.empty[String])
      case other => fail(s"unexpected $other")
    }.toDF("doc_id", "op", "source", "text")
    val merged = SnapshotOps.mergeApply(a, changes)
    assert(merged.exceptAll(b).isEmpty && b.exceptAll(merged).isEmpty)
  }

  test("refresh probe: materialized-input refresh equals the direct rollup of the capped application") {
    val probe = SnapshotOps.incrementalRollupProbe(t, maxChanges = 50)
    // ground truth: apply the SAME capped batch to A directly, then roll up
    val a = t.documents.select("doc_id", "source", "text")
    val capped = SnapshotOps.syntheticChangesWithImages(t)
      .orderBy("doc_id").limit(50)
    val direct = SnapshotOps.rollupStats(SnapshotOps.mergeApply(a, capped))
      .orderBy("source")
    assert(probe.exceptAll(direct).isEmpty && direct.exceptAll(probe).isEmpty)
    // the timed plan scans the two materialized inputs, not documents.parquet
    val scans = probe.queryExecution.executedPlan.toString
    assert(!scans.contains("documents.parquet"),
      "refresh probe still scans the corpus")
  }

  test("retention purge: purge-before-apply equals filter-after-apply, and no purged id survives") {
    val a = t.documents.select("doc_id", "source", "text")
    val feed = SnapshotOps.compactChanges(
      SnapshotOps.syntheticChanges(t), SnapshotOps.syntheticChanges2(t))
    val ids = a.select("doc_id").unionByName(feed.select("doc_id"))
      .distinct().filter(col("doc_id") % 17 === 3)
    val purged = SnapshotOps.mergeApply(
      SnapshotOps.purgeIds(a, ids), SnapshotOps.purgeIds(feed, ids))
    val filtered = SnapshotOps.syntheticSnapshotC(t)
      .filter(col("doc_id") % 17 =!= 3)
    assert(purged.exceptAll(filtered).isEmpty &&
      filtered.exceptAll(purged).isEmpty,
      "purge does not commute with apply")
    assert(purged.filter(col("doc_id") % 17 === 3).count() == 0)
    // the purge genuinely removed something
    assert(purged.count() <
      SnapshotOps.syntheticSnapshotC(t).count())
  }

  test("time travel: each version reconstructs its snapshot exactly") {
    val a = t.documents.select("doc_id", "source", "text")
    val b = SnapshotOps.syntheticSnapshotB(t)
    val c = SnapshotOps.syntheticSnapshotC(t)
    Seq(0 -> a, 1 -> b, 2 -> c).foreach { case (v, snap) =>
      val got = SnapshotOps.asOfVersion(t, v)
      assert(got.exceptAll(snap).isEmpty && snap.exceptAll(got).isEmpty,
        s"as-of v$v diverges from its snapshot")
    }
  }

  test("version history: rows equal the per-version rollups, and versions genuinely differ") {
    val hist = SnapshotOps.versionHistory(t).collect()
      .map(r => r.getAs[Int]("version") -> r).toMap
    assert(hist.keySet == Set(0, 1, 2))
    Seq(0, 1, 2).foreach { v =>
      val d = SnapshotOps.asOfVersion(t, v).agg(
        count(lit(1)), sum(length(col("text"))).cast("long")).head()
      assert(hist(v).getAs[Long]("n_docs") == d.getLong(0))
      assert(hist(v).getAs[Long]("total_chars") == d.getLong(1))
      assert(hist(v).getAs[Long]("digest_sum") >= 0L &&
        hist(v).getAs[Long]("digest_sum") < (1L << 48))
    }
    // the chain is a real history, not three copies of the same table
    assert(hist(0).getAs[Long]("digest_sum") != hist(1).getAs[Long]("digest_sum"))
    assert(hist(1).getAs[Long]("digest_sum") != hist(2).getAs[Long]("digest_sum"))
  }

  test("sourceDrift: appear/disappear/stable/shifted sources each report correctly") {
    import spark.implicits._
    val a = (Seq.fill(100)("stable") ++ Seq.fill(100)("shrinks") ++
      Seq.fill(40)("vanishes") ++ Seq.fill(100)("nudged"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "t") }
      .toDF("doc_id", "source", "text")
    val b = (Seq.fill(100)("stable") ++ Seq.fill(80)("shrinks") ++
      Seq.fill(30)("appears") ++ Seq.fill(104)("nudged"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "t") }
      .toDF("doc_id", "source", "text")
    val got = SnapshotOps.sourceDrift(a, b).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("stable") == ((100L, 100L, 0L, false)))
    assert(got("shrinks") == ((100L, 80L, -20L, true)))
    assert(got("vanishes") == ((40L, 0L, -40L, true)))
    assert(got("appears") == ((0L, 30L, 30L, true)))
    // 4% move stays under the 5% fence: 4*20 = 80 <= 100
    assert(got("nudged") == ((100L, 104L, 4L, false)))
  }

  test("the full-outer exchange carries digests, never text") {
    val inputs = exchangeInputs(SnapshotOps.snapshotDiffStats(t))
    assert(inputs.nonEmpty)
    inputs.foreach { in =>
      assert(!in.contains("text#"), s"an exchange still carries text: $in")
    }
    assert(inputs.exists(in => in.contains("dig_a#") || in.contains("dig_b#")),
      s"no exchange carries the digests:\n${inputs.mkString("\n")}")
  }

  // --- anti-entropy (round 12) ---

  test("anti-entropy flags exactly the buckets that diverge, by kind: payload, membership, identity") {
    import spark.implicits._
    // 4 buckets; ids chosen so bucket = id % 4 is obvious
    val a = Seq(
      (0L, "s", "clean"),   (4L, "s", "clean2"),   // bucket 0: identical
      (1L, "s", "payload"),                        // bucket 1: text changes
      (2L, "s", "member"),  (6L, "s", "member2"),  // bucket 2: a row is lost
      (3L, "s", "ident")                           // bucket 3: id changes, text same
    ).toDF("doc_id", "source", "text")
    val b = Seq(
      (0L, "s", "clean"),   (4L, "s", "clean2"),
      (1L, "s", "PAYLOAD"),
      (2L, "s", "member"),
      (7L, "s", "ident")                           // 3 → 7: same bucket, same count, same text
    ).toDF("doc_id", "source", "text")
    val diverged = SnapshotOps.antiEntropyDiff(a, b, buckets = 4)
      .select("bucket").as[Int].collect().toSet
    assert(diverged == Set(1, 2, 3),
      "payload moves the digest, membership the count, identity the id_sum — bucket 0 stays clean")
  }

  test("anti-entropy: a null↔empty-string payload flip diverges (the sentinel is not '')") {
    import spark.implicits._
    val a = Seq((0L, Option("s"), "t"), (1L, None: Option[String], "t"))
      .toDF("doc_id", "source", "text")
    val b = Seq((0L, Option("s"), "t"), (1L, Option(""), "t"))
      .toDF("doc_id", "source", "text")
    val diverged = SnapshotOps.antiEntropyDiff(a, b, buckets = 2)
      .select("bucket").as[Int].collect().toSet
    assert(diverged == Set(1),
      "null source and empty-string source must carry different digests")
  }

  test("anti-entropy repair restores replica A exactly while touching only diverged buckets") {
    val a = t.documents.select("doc_id", "source", "text")
    val repaired = SnapshotOps.antiEntropyRepairRoundtrip(t)
    // the gate's rollup must equal rollup(A) — row-for-row
    val direct = a.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(length(col("text"))).cast("long"), lit(0L)).as("total_chars"),
        min(md5(col("text"))).as("min_digest"),
        max(md5(col("text"))).as("max_digest"))
      .orderBy("source")
    assert(repaired.exceptAll(direct).count() == 0 &&
      direct.exceptAll(repaired).count() == 0)
  }

  test("anti-entropy summaries shuffle O(buckets) digest rows, never text") {
    val inputs = exchangeInputs(SnapshotOps.antiEntropyGate(t))
    assert(inputs.nonEmpty)
    inputs.foreach { in =>
      assert(!in.contains("text#"), s"an exchange still carries text: $in")
    }
  }
}
