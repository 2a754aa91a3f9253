package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs cosine-similarity join over sparse TF-IDF document vectors —
  * the weighted-vector sibling of [[Dedup.ngramJaccard]] (which covers the
  * set/Jaccard case), after Bayardo, Ma & Srikant, "Scaling Up All Pairs
  * Similarity Search" (WWW'07): candidate generation is an equi-join on a
  * *prefix* of each document's features, never an all-pairs product.
  *
  * Prefix bound: with every vector L2-normalized, order each document's
  * features by one GLOBAL total order (descending per-token max weight,
  * token-hash tie-break — both sides of any pair walk the same order, the
  * property the share-a-prefix-feature proof needs). For a feature at
  * position i, the contribution any partner can get from features at
  * positions ≥ i is at most Σ_{j≥i} w_j · maxw(t_j); once that bound drops
  * below the threshold the remaining suffix alone can never reach t, so a
  * qualifying pair must share an *indexed* (prefix) feature — of both
  * docs, since the argument applies to each side. The candidate equi-join
  * on prefix features is therefore exact (no false negatives), and a
  * full-feature join re-computes true cosine on the survivors.
  *
  * Every quantity the result depends on is fixed-point so the DuckDB
  * oracle replays it bit-for-bit: raw TF-IDF rounds to integer MICRO-units
  * (1e-6) before anything else; the L2 norm is an exact long sum of
  * squared micros; normalized weights re-round to micros; dot products
  * and prefix bounds are exact long sums of micro×micro PICO-units.
  * Doubles appear only in (identically-shaped, correctly-rounded) ln /
  * sqrt / division expressions and in the final cosine display value.
  * Long headroom: norm² ≤ n_tokens · (maxw_micro)² — past ~10⁹ unit-scale
  * feature weights per doc, shard the sum (same cap as Pca's fixed-point
  * Gram; documents are nowhere near it).
  *
  * 100 TB shape: tf/df/maxw are hash aggs on (doc, token-hash) /
  * token-hash; the only windows are per-document (millions of small
  * partitions); the candidate join carries 8-byte hashes and the verify
  * join 16-byte (hash, weight) pairs. Prefix indexing keeps the join's
  * posting lists to the high-impact features — the same df-style skew
  * armor as PPJoin's rare-first prefixes, since high-maxw tokens are the
  * high-idf (rare) ones.
  */
object CosinePairs {

  private val Micro = 1e6
  private val PicoPerUnit = 1e12

  /** Document pairs with TF-IDF cosine similarity ≥ `threshold`.
    * Output: (doc_a, doc_b, cosine), doc_a < doc_b.
    */
  def cosinePairs(documents: DataFrame, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      "threshold must be in (0, 1] — the prefix bound is undefined at 0")
    // round, not ceil: 0.9*1e12 lands a hair ABOVE 9e11 in binary, and
    // ceil would make the engine one pico-unit stricter than the oracle's
    // integer literal on knife-edge pairs
    val tPico = math.round(threshold * PicoPerUnit)
    val feats = features(documents)
    val prefixes = prefixFeatures(feats, tPico)

    // Pairwise Cauchy–Schwarz prune inside the join predicate: each prefix
    // row carries tn = ⌈√(Σ_tail wn²)⌉ at its feature. For any qualifying
    // pair consider its globally-EARLIEST shared feature h* — every shared
    // feature of the pair sits at position ≥ h* in BOTH docs' (shared)
    // global order, so dot ≤ ‖tail_a(h*)‖·‖tail_b(h*)‖ ≤ tn_a·tn_b, and
    // the h*-row-pair always survives the predicate: no false negatives.
    // It multiplies the two ACTUAL tails where the index-stage bound could
    // only compare each tail against the corpus-max partner norm. On
    // deep-prefix corpora it drops deep-shared-feature row-pairs before
    // they cost anything; on this template-heavy fixture the shared
    // features sit high in both prefixes, so the measured prune is ~1 %
    // (10.84 M → 10.75 M) — kept because it is free (two longs already in
    // the join row) and corpus-shape insurance.
    val rawPairs = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.hv") === col("b.hv") && col("a.doc_id") < col("b.doc_id") &&
          col("a.tn") * col("b.tn") >= tPico)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))

    // exact verify: each doc's features pack into ONE hv-sorted sparse
    // vector, and a codegen merge-walk computes the exact pico dot per
    // candidate row. The alternative (explode features, equi-join on hv,
    // re-aggregate per pair) shuffles Σ|shared| rows per candidate —
    // measured 29 s vs ~4 s at sf0.1 on self-similar corpora where
    // candidates are ~10 M. Same long arithmetic, same result.
    val docVecs = graft.Caching.materialize(feats.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("hv"), col("wn")))).as("fv")))

    // Distinct FIRST, then shuffled verify joins: each candidate pair is
    // verified exactly once. A broadcast-verify variant (probe the raw
    // 26 M-row pre-distinct multiset against broadcast vectors, dedup
    // the survivors) was tried and REVERTED: the optimizer's
    // sizeInBytes estimate for the packed-vector table wildly
    // understates the in-memory hash-relation (arrays of structs), so
    // the "under budget" branch built a multi-hundred-MB broadcast and
    // re-dotted 2.4× the pairs — BENCH_r04 measured it at 22.6 s
    // steady-state / 237 s cold vs 3.96 s for this formulation.
    val verified = verifyDot(rawPairs.distinct(), docVecs)
      .filter(col("dot_pico") >= tPico)
    verified.select(col("doc_a"), col("doc_b"),
      (col("dot_pico").cast("double") / PicoPerUnit).as("cosine"))
  }

  /** The exact-dot verify join: attach both packed vectors to each
    * candidate row and compute the pico dot with the codegen merge-walk.
    */
  private def verifyDot(pairs: DataFrame, docVecs: DataFrame): DataFrame = {
    pairs
      .join(docVecs.select(col("doc_id").as("doc_a"), col("fv").as("fva")), "doc_a")
      .join(docVecs.select(col("doc_id").as("doc_b"), col("fv").as("fvb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.VectorFunctions.sorted_weight_dot(
          col("fva"), col("fvb")).as("dot_pico"))
  }

  /** L2-normalized micro-unit TF-IDF features (doc_id, hv, wn) — the
    * shared first stage of [[cosinePairs]] and the dev profiler
    * (`dev.ProfileCosine` MUST build on this, not a copy). Persisted;
    * release via the library cache contract.
    */
  private[graft] def features(documents: DataFrame): DataFrame = {
    // (doc, token) term frequencies; tokens fold to 60-bit md5 ids (hv) so
    // every downstream join moves longs, not strings — md5 (not xxhash64)
    // because the oracle must derive the identical ids (see Dedup.md5Base60)
    val toks = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), Dedup.md5Base60(col("token")).as("hv"), col("tf"))
    val dfreq = tf.groupBy("hv").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))

    // raw tf·ln(N/df) → micro-units, half-up; df == N tokens carry zero
    // information (idf 0) and drop here on both engines
    val wRaw = tf.join(dfreq, "hv").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("hv"),
        floor(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")) *
          Micro + 0.5).cast("long").as("w_micro"))
      .filter(col("w_micro") > 0)

    // exact L2 normalization: long norm² of micros, one correctly-rounded
    // sqrt + division, re-round to micros (wn ≤ 1e6 by construction)
    val norms = wRaw.groupBy("doc_id")
      .agg(sum(col("w_micro") * col("w_micro")).as("norm2"))
    wRaw.join(norms, "doc_id")
      .select(col("doc_id"), col("hv"),
        floor(col("w_micro").cast("double") * Micro /
          sqrt(col("norm2").cast("double")) + 0.5).cast("long").as("wn"))
      .filter(col("wn") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Indexed (prefix) features of every document under the dual tail
    * bound — the candidate-generation stage of [[cosinePairs]], shared
    * with the dev profiler. Persisted.
    */
  private[graft] def prefixFeatures(feats: DataFrame, tPico: Long): DataFrame = {
    // per-token max normalized weight = the partner-side bound per feature
    val maxw = feats.groupBy("hv").agg(max(col("wn")).as("maxw"))

    // Half-up rounding lets a partner's ACTUAL norm √(Σ wn²) land a few
    // micros above 1e6, so bound (2) must not hardcode the nominal unit
    // norm — a knife-edge pair reachable only through that inflation
    // would be wrongly pruned. The correct partner factor is the corpus
    // maximum rounded-norm, one scalar agg over the persisted features
    // (bounded driver state, like PageRank's N); ceil on both sqrt's
    // keeps the product an over-estimate of the true Cauchy–Schwarz
    // bound, preserving exactness.
    // Guarded scalar: on an EMPTY feature relation (empty corpus, or an
    // all-duplicates corpus where every token has df==N so every idf-0
    // weight is filtered out) the global max aggregate returns one NULL
    // row — getLong would NPE on exactly the degenerate input a dedup
    // pipeline can see. No features ⇒ no candidate pairs ⇒ empty result.
    val maxN2 = feats.groupBy("doc_id").agg(sum(col("wn") * col("wn")).as("n2"))
      .agg(max(col("n2")).as("mx")).head()
    if (maxN2.isNullAt(0))
      return feats.limit(0).select(col("doc_id"), col("hv"), lit(0L).as("tn"))
    val maxPartnerNorm = math.ceil(math.sqrt(maxN2.getLong(0).toDouble)).toLong

    // global feature order: (maxw desc, hv asc). A feature is indexed iff
    // the dot contribution of the suffix starting at it can still reach t,
    // under the TIGHTER of two exact bounds:
    //   (1) Σ_tail wn·maxw          — the AllPairs partner-max bound
    //   (2) ‖tail‖₂ · ‖partner‖₂ ≤ ⌈√(Σ_tail wn²)⌉ · max-norm   — Cauchy–Schwarz
    // On template-heavy corpora maxw saturates at ~1e6 and bound (1)
    // degenerates to the suffix L1 (at sf0.1 it indexed 70 % of all
    // features); bound (2) collapses the prefix to the top ~(1−t²) of
    // each doc's squared mass (measured 81 k → 25.6 k prefix rows at
    // t = 0.9 — candidate count stays corpus-bound, ~10.8 M here,
    // because template groups genuinely share their top-mass tokens;
    // see the verify-stage note below). Correctness: the
    // globally-earliest shared feature of any qualifying pair must sit in
    // BOTH prefixes (if it didn't, every shared feature would lie in that
    // side's tail, whose bound is < t — contradiction), so the prefix
    // equi-join cannot miss a pair.
    val ordered = feats.join(maxw, "hv")
    val tailWin = Window.partitionBy("doc_id")
      .orderBy(col("maxw").desc, col("hv").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // eagerly materialized: both sides of the candidate self-join consume
    // this from concurrent stages (see graft.Caching)
    graft.Caching.materialize(ordered
      .withColumn("tail_dot_bound", sum(col("wn") * col("maxw")).over(tailWin))
      .withColumn("tail_norm2", sum(col("wn") * col("wn")).over(tailWin))
      .filter(col("tail_dot_bound") >= tPico &&
        ceil(sqrt(col("tail_norm2").cast("double"))).cast("long") *
          maxPartnerNorm >= tPico)
      // tn = ⌈‖tail at this feature‖⌉ rides along for the candidate
      // join's pairwise Cauchy–Schwarz predicate (see cosinePairs)
      .select(col("doc_id"), col("hv"),
        ceil(sqrt(col("tail_norm2").cast("double"))).cast("long").as("tn")))
  }
}
