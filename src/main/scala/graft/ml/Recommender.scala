package graft.ml

import graft.core.Tables
import graft.functions.NumericFunctions.roundN
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature._
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
  * JVM/Python boundary); here the dot product is the codegen'd `graft_dot`
  * Catalyst expression and top-k is `orderBy(desc).limit(k)` →
  * TakeOrderedAndProject, so only k rows per partition are ever collected.
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
    *
    * Scoring is `vector_to_array` + the codegen'd `graft_dot` expression
    * (graft.plans.VectorExpressions), keeping the hot loop inside
    * whole-stage codegen. A/B at sf0.01 (min of 3, noop sink): graft_dot
    * 0.29 s vs a sparse merge-dot Scala UDF 0.35 s — the fixture corpus
    * draws from a ~29-word vocabulary, so the "sparse" TF-IDF vectors are
    * effectively dense and densifying costs nothing. CAVEAT for real
    * corpora: with vocabularies of 10⁵+ and nnz≈doc length, vector_to_array
    * materializes |vocab| doubles per row and the sparse merge-dot (O(nnz))
    * is the right tool — pick per corpus shape.
    */
  def similarDocs(t: Tables, queryDocId: Long = 0L, k: Int = 5): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val vecs = tfidfVectors(t)
    val q = vecs.filter(col("doc_id") === queryDocId)
      .select(vector_to_array(col("features_norm")).as("q_arr"))
    vecs.filter(col("doc_id") =!= queryDocId)
      .crossJoin(broadcast(q))
      .withColumn("score", roundN(
        call_function("graft_dot",
          vector_to_array(col("features_norm")), col("q_arr")), 6))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
      .select("doc_id", "lang", "source", "score")
  }
}
