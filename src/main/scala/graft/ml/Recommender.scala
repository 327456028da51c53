package graft.ml

import graft.core.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature._
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF + cosine-similarity recommender — the engine twin of the
  * reference's `notebook_to_py/recomendation-system.py` (SURVEY.md §2.10
  * M13–M14), over `documents`.
  *
  * Pipeline shape is the reference's: RegexTokenizer(\W) →
  * StopWordsRemover → CountVectorizer → IDF(minDocFreq) → Normalizer(p=2).
  * The scoring difference is deliberate: the reference drops to a Python RDD
  * (`recomendation-system.py:168-170` — every row pickled across the
  * JVM/Python boundary); here the dot product is a native UDF over ML
  * vectors and top-k is `orderBy(desc).limit(k)` → TakeOrderedAndProject,
  * so only k rows per partition are ever collected.
  */
object Recommender {

  /** Fit the TF-IDF pipeline and return normalized document vectors. */
  def tfidfVectors(t: Tables): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("words").setPattern("\\W"),
      new StopWordsRemover().setInputCol("words").setOutputCol("filtered"),
      new CountVectorizer().setInputCol("filtered").setOutputCol("tf")
        .setVocabSize(1 << 16).setMinDF(1.0),
      new IDF().setInputCol("tf").setOutputCol("tfidf").setMinDocFreq(5),
      new Normalizer().setInputCol("tfidf").setOutputCol("features_norm").setP(2.0)))
    val docs = t.documents.select("doc_id", "text", "lang", "source")
    pipeline.fit(docs).transform(docs)
      .select("doc_id", "lang", "source", "features_norm")
  }

  /** Top-k most similar documents to `queryDocId` by TF-IDF cosine.
    * Normalized vectors ⇒ cosine == dot. The query vector rides along as a
    * broadcast 1-row frame (no driver collect of the corpus).
    */
  def similarDocs(t: Tables, queryDocId: Long = 0L, k: Int = 5): DataFrame = {
    val vecs = tfidfVectors(t)
    // sparse-aware merge-dot; normalized inputs make this cosine similarity
    val dotUdf = udf((a: Vector, b: Vector) => {
      val sa = a.toSparse; val sb = b.toSparse
      val ai = sa.indices; val av = sa.values
      val bi = sb.indices; val bv = sb.values
      var i = 0; var j = 0; var s = 0.0
      while (i < ai.length && j < bi.length) {
        if (ai(i) == bi(j)) { s += av(i) * bv(j); i += 1; j += 1 }
        else if (ai(i) < bi(j)) i += 1
        else j += 1
      }
      s
    })
    val q = vecs.filter(col("doc_id") === queryDocId)
      .select(col("features_norm").as("q_vec"))
    vecs.filter(col("doc_id") =!= queryDocId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(dotUdf(col("features_norm"), col("q_vec")), 6))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
      .select("doc_id", "lang", "source", "score")
  }
}
