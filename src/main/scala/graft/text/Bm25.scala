package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical search (Robertson/Spärck Jones; the Okapi BM25 ranking
  * function every search engine ships) over the documents corpus —
  * the sparse/lexical counterpart of the dense-vector ANN tier.
  *
  * Determinism scheme (what makes this oracle-checkable):
  *  - Per-(doc, token) BM25 term scores end in `floor(x·10⁶ + 0.5)`
  *    micro-unit LONGS — the only float risk is ln()'s last ulp, pinned
  *    by the same round-then-integerize pattern the ANN cosines use.
  *  - Per-(query, doc) totals are SUMS OF LONGS — exact and
  *    order-independent, so partial-aggregation order (and engine) can't
  *    move a score. The final score divides once by 10⁶.
  *  - Ranking ties break on doc_id.
  *
  * Scale shape: term scores are one hash-agg over the token explosion;
  * corpus stats (N, avgdl) are a broadcast scalar; query terms (a
  * benchmark-sized relation) broadcast against the posting relation, so
  * the only large shuffle is the (query, doc) score aggregation, keyed
  * fine. Hot-token skew is the classic inverted-index trade: cap df or
  * drop stop-tokens upstream for adversarial corpora.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Unigram language-model scoring (the CCNet-style perplexity quality
    * filter, with a unigram LM in place of the 5-gram KenLM): every
    * document scored by its average token log-probability under a
    * Laplace-smoothed unigram model of the corpus itself. Low scores =
    * improbable token distributions = boilerplate/garbage candidates.
    *
    * Same determinism scheme as [[topK]]: per-token ln(p) pinned to
    * `floor(x·10⁶ + 0.5)` micro-longs (works for negatives — half
    * toward +∞ in both engines), per-doc totals exact long sums, one
    * final division. The model is the (token, count) relation + two
    * scalars (N, V) — broadcast model state, corpus streams once to
    * build it and once to score.
    */
  def unigramLogprob(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("v_size"))
    val tokMicro = floor(
      log((col("c") + 1.0) / (col("n_total") + col("v_size"))) * 1.0e6 + 0.5)
      .cast("long")
    val scored = toks
      .join(broadcast(counts), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), tokMicro.as("lp_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("lp_sum_micro"))
    documents.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("lp_sum_micro"), lit(0L)).as("lp_sum_micro"),
        when(col("n_tokens").isNull || col("n_tokens") === 0, lit(0.0))
          .otherwise(col("lp_sum_micro").cast("double") /
            (col("n_tokens") * 1000000.0))
          .as("avg_logprob"))
  }

  /** (query_id, doc_id, score_micro, score, rank): top-k corpus documents
    * per query document (queries = doc_id < nQueries), scored by BM25
    * over the queries' distinct tokens. Self-matches excluded.
    */
  def topK(documents: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val docLen = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = documents.agg(count(lit(1)).as("n_docs"))
      .crossJoin(docLen.agg(sum(col("dl")).as("total_len")))
    // idf = ln((N − df + 0.5)/(df + 0.5) + 1)  [Robertson+, non-negative]
    // sat = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)),  avgdl = total/N
    //
    // Constants appear as the LITERALS 2.2 / 1.2 / 0.25 / 0.75 — NOT as
    // Scala arithmetic like K1 + 1: double(1.2) + 1 is one ulp away from
    // double(2.2), and the oracle parses the literal. The whole expression
    // tree (association order included) mirrors the SQL exactly.
    val scoreMicro = {
      val avgdl = col("total_len").cast("double") / col("n_docs")
      val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val sat = (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
      floor(idf * sat * 1.0e6 + 0.5).cast("long")
    }
    val posting = tf
      .join(docLen, "doc_id")
      .join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"), scoreMicro.as("s_micro"))
    val queryTerms = toks.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("token")).distinct()
    val scored = posting
      .join(broadcast(queryTerms), "token")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("s_micro")).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_micro"),
        (col("score_micro").cast("double") / 1.0e6).as("score"), col("rank"))
  }
}
