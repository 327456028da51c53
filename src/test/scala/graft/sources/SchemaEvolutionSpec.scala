package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkTestBase {

  test("the evolved dir is physically two-generation: files disagree on column count") {
    val dir = SchemaEvolution.evolvedDir(t)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val widths = files.map(f => spark.read.parquet(f).schema.size).toSet
    assert(widths == Set(3, 5), s"expected 3- and 5-column files, got $widths")
  }

  test("schema-first read == mergeSchema read, row for row") {
    val merged = SchemaEvolution.mergedRead(t)
      .select("doc_id", "source", "text", "lang", "n_chars")
    val first = SchemaEvolution.schemaFirstRead(t)
      .select("doc_id", "source", "text", "lang", "n_chars")
    assert(merged.schema.map(f => (f.name, f.dataType)) ==
      first.schema.map(f => (f.name, f.dataType)))
    assert(first.exceptAll(merged).isEmpty && merged.exceptAll(first).isEmpty)
  }

  test("generation-1 rows read null for the evolved columns; generation-2 rows keep values") {
    val df = SchemaEvolution.schemaFirstRead(t)
    assert(df.filter(col("doc_id") % 2 === 0)
      .filter(col("lang").isNotNull || col("n_chars").isNotNull).count() == 0)
    val gen2Nulls = df.filter(col("doc_id") % 2 === 1)
      .filter(col("n_chars").isNull).count()
    assert(gen2Nulls == 0, s"$gen2Nulls generation-2 rows lost n_chars")
  }

  test("no row lost or invented across the evolution boundary") {
    val src = t.documents.select("doc_id", "source", "text")
    val back = SchemaEvolution.schemaFirstRead(t)
      .select("doc_id", "source", "text")
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
  }

  test("type widening: narrow int32/float generation reads back exactly under the wide schema") {
    val dir = SchemaEvolution.widenedDir(t)
    // physically two-generation: file schemas disagree on the PHYSICAL
    // type of the same column names
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val nCharsTypes = files
      .map(f => spark.read.parquet(f).schema("n_chars").dataType.typeName).toSet
    assert(nCharsTypes == Set("integer", "long"),
      s"expected int32 and int64 generations, got $nCharsTypes")
    // the widened read's values equal the source-derived wide values
    // exactly — the promotions are lossless, no value shifted
    val back = SchemaEvolution.widenedRead(t)
      .select("doc_id", "source", "n_chars", "score")
    val src = t.documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("score", col("n_chars").cast("double") * 0.5)
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
  }

  test("type widening: mergeSchema cannot serve an int-vs-long corpus — schema-first is the only path") {
    // StructType.merge refuses to widen conflicting primitive types, so
    // the discovery read FAILS on a type-evolved dir; pinning the failure
    // documents why widenedRead states the schema instead
    val e = intercept[Throwable] {
      t.spark.read.option("mergeSchema", "true")
        .parquet(SchemaEvolution.widenedDir(t)).collect()
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("merge") || msg.toLowerCase.contains("schema"),
      s"expected a schema-merge failure, got: $msg")
  }

  test("rollup gate backfills old-generation chars from the text itself") {
    val row = SchemaEvolution.evolutionRollup(t)
      .agg(sum("total_chars"), sum("n_docs"), sum("n_evolved")).head()
    val direct = t.documents.agg(
      sum(length(col("text")).cast("long")),
      count(lit(1)),
      count(when(col("doc_id") % 2 === 1 && col("lang").isNotNull, 1))).head()
    // fixture n_chars == length(text), so the backfilled total matches
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getLong(1) == direct.getLong(1))
    assert(row.getLong(2) == direct.getLong(2))
  }
}
