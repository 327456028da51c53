package graft.multimodal

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata
  * struct, with a partition-wise batch "decode" stage.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (`stubDecodeFeatures`) — it derives a
  * fixed-size feature vector from the bytes with a rolling hash. Everything
  * around it is the real Spark shape a production decoder plugs into:
  *
  *  - assets are rows of (id, meta struct, binary payload);
  *  - decode runs via `mapPartitions` on a typed Dataset — the JVM
  *    equivalent of `mapInPandas`: one iterator per partition, so a real
  *    decoder amortizes model/codec init per partition, not per row;
  *  - output schema is columnar (id, width, height, format, features),
  *    ready for the similarity operators downstream.
  */
object MultimodalOps {

  /** Asset row: binary payload + typed metadata, as a training pipeline
    * would land it from an object store manifest.
    */
  case class Asset(asset_id: Long, format: String, width: Int, height: Int,
                   payload: Array[Byte])

  case class AssetFeatures(asset_id: Long, format: String, n_bytes: Int,
                           features: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Synthesize a deterministic asset table from `documents` (text bytes as
    * the opaque payload; metadata derived from stable columns). Stands in
    * for `spark.read.format("binaryFile")` at test scale.
    */
  def syntheticAssets(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id").as("asset_id"),
      concat(lit("img/"), col("source")).as("format"),
      (pmod(col("n_chars"), lit(64)) + 16).cast(IntegerType).as("width"),
      (pmod(col("doc_id"), lit(64)) + 16).cast(IntegerType).as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Real binary ingestion via Spark's `binaryFile` source — the production
    * entry point [[syntheticAssets]] stands in for. Each matched file
    * becomes one row of (path, modificationTime, length, content); at scale
    * this is the object-store asset scan, filtered server-side with
    * `pathGlobFilter` / `modifiedAfter` so only matching objects are
    * listed. The sandbox ships no image/audio files, so the demo reads the
    * fixture parquet files themselves as opaque payloads — the source
    * mechanics (schema, laziness, glob pushdown) are identical.
    */
  def binaryAssets(spark: SparkSession, dir: String,
                   glob: String = "*.parquet"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("byte_len"),
        col("content"))

  /** Gate query over [[binaryAssets]]: per-file name, size, and content
    * digest — proves the binary payload survives the source intact
    * (md5(content) vs the on-disk bytes is asserted in the spec). Rows-only
    * in the oracle gate: the oracle sees table views, not the directory.
    */
  def binaryIngestStats(t: Tables): DataFrame =
    binaryAssets(t.spark, t.dir)
      .select(col("file_name"), col("byte_len"), md5(col("content")).as("content_md5"))
      .orderBy("file_name")

  /** STUB decode kernel — stands in for an image/audio codec. Deterministic
    * function of the payload bytes only: a production decoder replaces this
    * body and nothing else changes.
    */
  private[multimodal] def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      acc(i % dim) = acc(i % dim) * 31 + b + 1
      i += 1
    }
    acc.map(v => ((v & 0xffff).toFloat) / 65536.0f)
  }

  /** Partition-wise batch decode (mapInPandas-shaped): iterator in,
    * iterator out; per-partition init happens once, rows stream through.
    */
  def decodeAssets(spark: SparkSession, assets: DataFrame, dim: Int = 16): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, model load)
      it.map { a =>
        AssetFeatures(a.asset_id, a.format, a.payload.length,
          stubDecodeFeatures(a.payload, dim))
      }
    }
  }

  /** End-to-end query: synthesize → decode → aggregate per format. The
    * aggregate keys on the metadata column, proving schema survives the
    * binary hop.
    */
  def assetFeatureStats(t: Tables): DataFrame = {
    val decoded = decodeAssets(t.spark, syntheticAssets(t)).toDF()
    decoded
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        sum("n_bytes").as("total_bytes"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy("format")
  }
}
