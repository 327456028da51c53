package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** CSV source/sink surface (SURVEY.md §2.1 S1/S2).
  *
  * The reference loads everything via
  * `spark.read.format('csv').option('header','true').option('inferSchema',
  * 'true')` (ref `notebook_to_py/data-understanding.py:43`) and — because
  * the real file is dirty — inference resolves EVERY column to string
  * (SURVEY §1.2); numeric behavior then comes from explicit downstream
  * casts with ANSI-off null-on-miscast semantics. Both modes are exposed:
  *
  *  - [[readInferred]] — the trusting double-scan inference read;
  *  - [[readAllStrings]] — the dirty-data contract: one scan, every column
  *    nullable string, semantics fixed by an explicit [[castPipeline]].
  *
  * At 100 TB the inference pre-scan is a full extra pass over the data, so
  * the all-strings + explicit-cast path (or a known schema) is the one that
  * scales; inference stays available for parity and exploration.
  */
object CsvIO {

  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Single-pass read with every column a nullable string — the schema the
    * reference actually ends up with on its dirty file.
    */
  def readAllStrings(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .csv(path)

  /** Explicit cast stage (SURVEY §1.2/§2.2 P11): bad parses become null
    * (ANSI off via try_cast semantics — `cast` under ANSI mode would throw
    * on the first junk row at scale).
    */
  def castPipeline(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, org.apache.spark.sql.functions.expr(s"try_cast(`$c` AS ${t.sql})"))
    }

  /** CSV sink (S2, ref `performance_py/2-cores-6-instances.py:1462-1465`). */
  def write(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)

  /** COLUMN-level CSV codec (`to_csv`/`from_csv`): encode a struct into an
    * embedded CSV line and parse it back, entirely inside one projection —
    * the shape for CSV-in-a-column feeds (log lines, queue payloads) where
    * no file ever exists. Double fidelity rides on shortest-round-trip
    * formatting: `to_csv` prints the shortest decimal that reparses to the
    * identical bits, so the encode→parse hop is lossless and the rollup
    * hash-matches an oracle that never saw CSV at all.
    */
  def csvColumnRoundtrip(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.NumericFunctions.{decSum, roundN}
    val schema = StructType(Nil)
      .add("o_orderkey", "bigint").add("o_orderstatus", "string")
      .add("o_totalprice", "double")
    t.orders
      .select(to_csv(struct(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))).as("line"))
      .select(from_csv(col("line"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.o_orderstatus").as("o_orderstatus"),
        col("r.o_totalprice").as("o_totalprice"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        roundN(decSum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("o_orderstatus")
  }
}
