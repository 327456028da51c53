package graft.streaming

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming near-duplicate detection: the MinHash+LSH band join as a
  * STATEFUL streaming operator — the "is this incoming document a near-dup
  * of anything already ingested" primitive of a continuously-fed training
  * corpus.
  *
  * Shape: the SAME Column pipeline as the batch operator
  * ([[DedupOps.bandedDocs]] — Spark's unified batch/stream model) fans
  * each document out to its 8 LSH band keys; `flatMapGroupsWithState`
  * keyed by band keeps the (doc_id, shingle-set) of every document seen in
  * that band and emits a verified pair the moment a new arrival collides
  * with a stored one. Exact same candidate generation as the batch
  * self-join, so over a finite replay the emitted pair set EQUALS the
  * batch result and shares its oracle — regardless of how the stream is
  * micro-batched (a pair collides whenever the later document arrives, in
  * whichever batch).
  *
  * Scale notes: state per band key is the band's collision bucket — the
  * same quantity that bounds the batch join's bucket sizes; shingle sets
  * are stored as 64-bit longs, never text. On an unbounded stream you
  * would evict state with an event-time watermark (dedup against a
  * trailing window) or back the state store with RocksDB; the fixture
  * replay needs neither, and the bounded-state variant is exercised by
  * [[EventStream.dedupCounts]].
  */
object DedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  case class BandDoc(doc_id: Long, band: String, sh: Array[Long])
  case class PairOut(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Bit-identical twin of the batch Column formulation
    * (`roundN(jaccard(a, b), 4)`): intersection over pre-deduplicated
    * long sets, one IEEE division, floor(x·10⁴+0.5)/10⁴.
    */
  private def jaccardRounded(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet
    var inter = 0
    b.foreach(x => if (sa(x)) inter += 1)
    val union = a.length + b.length - inter
    val j = if (union == 0) 0.0 else inter.toDouble / union.toDouble
    math.floor(j * 10000.0 + 0.5) / 10000.0
  }

  def minhashPairs(spark: SparkSession, dir: String, queryName: String,
                   minJaccard: Double = 0.3): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(docSchema)
      .parquet(s"$dir/{documents}.parquet")
    val banded = DedupOps.bandedDocs(docs).as[BandDoc]
    val out = banded
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Array[Long])], PairOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          var seen = state.getOption.getOrElse(Nil)
          val pairs = scala.collection.mutable.ListBuffer.empty[PairOut]
          it.foreach { d =>
            seen.foreach { case (oid, osh) =>
              if (oid != d.doc_id) {
                val j = jaccardRounded(d.sh, osh)
                if (j >= minJaccard)
                  pairs += PairOut(
                    math.min(oid, d.doc_id), math.max(oid, d.doc_id), j)
              }
            }
            seen = (d.doc_id, d.sh) :: seen
          }
          state.update(seen)
          pairs.iterator
      }
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    // a pair may collide in several bands (and across micro-batches);
    // jaccard is identical for every emission of the pair
    EventStream.drained(spark, queryName).dropDuplicates("doc_a", "doc_b")
  }
}
