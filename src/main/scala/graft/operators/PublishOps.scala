package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write–Audit–Publish — the commit protocol a 100 TB ingest runs so a
  * bad batch can NEVER become visible: every batch lands in an unlisted
  * staging location, the audit (a [[DataQualityOps]]-shaped constraint
  * pass) runs over the STAGED FILES — what was actually written, not
  * what the producer meant to write — and only a passing batch's files
  * are added to the published manifest. Readers resolve the manifest
  * ([[graft.sources.ParquetStats]]' file-listing posture), so an aborted
  * batch is not "deleted", it simply never exists to them.
  *
  * Scale shape: the audit is ONE aggregate pass per staged batch
  * (row-local constraints compile to conditional sums — adding a
  * constraint never adds a scan), and publish/abort is a manifest edit,
  * O(#files) strings. No corpus rescan anywhere.
  */
object PublishOps {

  /** The audit: primary-key uniqueness (hard — any duplicate aborts) and
    * text completeness (soft — tolerates ≤5% nulls, violations×20 ≤ rows
    * in exact integer arithmetic). One row: (n_rows, v_pk, v_text,
    * passed).
    */
  def auditDocs(staged: DataFrame): DataFrame =
    staged.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v_pk"),
      sum(when(col("text").isNotNull, 0L).otherwise(1L)).as("v_text"))
      .withColumn("passed",
        col("v_pk") === 0 && col("v_text") * 20 <= col("n_rows"))

  /** Gate query: two deterministic batches through the full WAP cycle —
    * batch `b1` (the doc_id ≡ 0 mod 3 slice) audits clean and publishes;
    * batch `b2` (the ≡ 1 mod 3 slice written TWICE — a retried producer
    * double-write, the classic duplication incident) fails the
    * uniqueness audit and aborts. Both audits run over the staged
    * parquet, and `n_rows_published` counts each batch's rows in a read
    * THROUGH the published manifest — 0 for the aborted batch proves the
    * protocol's whole point: the bad write never became visible. The
    * oracle restates batches, audit arithmetic, verdicts, and published
    * counts from the source table, so every column hash-gates.
    */
  def wapGate(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val docs = t.documents.select("doc_id", "source", "text")
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val slice2 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = slice2.unionByName(slice2)

    val work = java.nio.file.Files
      .createTempDirectory("graft_wap").toString
    val (r1, r2, pub1, pub2) = try {
      var manifest = Vector.empty[String]
      def stageAuditPublish(tag: String, batch: DataFrame): (Long, Long, Long, Boolean) = {
        val dir = s"$work/$tag"
        batch.write.mode("overwrite").parquet(dir)
        val a = auditDocs(spark.read.parquet(dir)).head()
        val passed = a.getAs[Boolean]("passed")
        if (passed) manifest ++= Tables.listLocalParquetFiles(dir)
        (a.getAs[Long]("n_rows"), a.getAs[Long]("v_pk"),
          a.getAs[Long]("v_text"), passed)
      }
      val a1 = stageAuditPublish("b1", b1)
      val a2 = stageAuditPublish("b2", b2)

      // the reader's view: resolve the manifest, never the staging tree
      val published =
        if (manifest.isEmpty) docs.filter(lit(false))
        else spark.read.parquet(manifest: _*)
      (a1, a2,
        published.filter(col("doc_id") % 3 === 0).count(),
        published.filter(col("doc_id") % 3 === 1).count())
    } finally Tables.deleteRecursively(work)

    // every term is already a driver-side scalar — the result frame is
    // local, so reclaiming the staging tree above was safe
    Seq(
      ("b1", r1._1, r1._2, r1._3, r1._4, pub1),
      ("b2", r2._1, r2._2, r2._3, r2._4, pub2))
      .toDF("batch", "n_rows", "v_pk", "v_text", "published",
        "n_rows_published")
      .orderBy("batch")
  }
}
