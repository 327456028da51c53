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
}
