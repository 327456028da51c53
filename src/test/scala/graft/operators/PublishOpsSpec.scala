package graft.operators

import graft.SparkTestBase

/** Write–Audit–Publish ([[PublishOps]]): audit verdicts on hand-built
  * batches, and the gate's invisibility guarantee for aborted writes.
  */
class PublishOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("audit: clean batch passes; duplicate keys abort; >5% null text aborts; ≤5% tolerated") {
    def audit(rows: Seq[(Long, String)]) =
      PublishOps.auditDocs(rows.toDF("doc_id", "text")).head()
    val clean = audit((1L to 40L).map(i => (i, s"t$i")))
    assert(clean.getAs[Boolean]("passed") && clean.getAs[Long]("v_pk") == 0)
    val dup = audit(Seq((1L, "a"), (1L, "a"), (2L, "b")))
    assert(!dup.getAs[Boolean]("passed") && dup.getAs[Long]("v_pk") == 1)
    // 3 nulls of 40 rows = 7.5% > 5% — soft constraint aborts
    val nully = audit((1L to 37L).map(i => (i, s"t$i")) ++
      Seq((38L, null), (39L, null), (40L, null)))
    assert(!nully.getAs[Boolean]("passed") && nully.getAs[Long]("v_text") == 3)
    // 2 of 40 = 5% — exactly at the tolerance, passes
    val edge = audit((1L to 38L).map(i => (i, s"t$i")) ++
      Seq((39L, null), (40L, null)))
    assert(edge.getAs[Boolean]("passed"))
  }

  test("gate: the clean batch publishes in full, the double-write aborts and stays invisible") {
    val rows = PublishOps.wapGate(t).collect()
      .map(r => r.getString(0) -> r).toMap
    val b1 = rows("b1"); val b2 = rows("b2")
    val n0 = t.documents.filter(org.apache.spark.sql.functions
      .col("doc_id") % 3 === 0).count()
    val n1 = t.documents.filter(org.apache.spark.sql.functions
      .col("doc_id") % 3 === 1).count()
    assert(b1.getAs[Boolean]("published") &&
      b1.getAs[Long]("n_rows") == n0 &&
      b1.getAs[Long]("n_rows_published") == n0)
    // the double-write: twice the slice, half duplicated, aborted, and
    // CRUCIALLY zero of its rows visible through the manifest
    assert(!b2.getAs[Boolean]("published") &&
      b2.getAs[Long]("n_rows") == 2 * n1 &&
      b2.getAs[Long]("v_pk") == n1 &&
      b2.getAs[Long]("n_rows_published") == 0L)
  }
}
