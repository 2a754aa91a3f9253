package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product quantization (Jégou et al., "Product quantization for nearest
  * neighbor search", TPAMI 2011) — the compression half of the classic
  * IVF-PQ index: each embedding is cut into `m` subvectors, each subvector
  * quantized to its nearest centroid from a per-subspace codebook of
  * `kCodes` entries, so a dim-double vector becomes `m` small codes
  * (64×8 bytes → 8 bytes here, a 64× memory cut on the ANN store).
  * Search never decodes: asymmetric distance (ADC) sums per-subspace
  * query→centroid distances from a precomputed lookup table.
  *
  * Scale shape, consistent with the rest of `similarity`:
  *  - Codebooks are MODEL STATE (m × kCodes × subDim doubles — 8 KB here),
  *    trained with the same deterministic machinery as
  *    [[Ann.kmeansAssign]]: md5-seeded starts, 1e-9 fixed-point exact
  *    means, row-local exact-double argmins with first-index tie-breaks —
  *    fit is bit-identical regardless of partitioning. The corpus is
  *    persisted once for the whole fit (one aggregation pass per Lloyd
  *    iteration streams over cached blocks).
  *  - Encode is a row-local codegen expression against the literal
  *    codebooks; search joins ONE broadcast LUT relation (nQueries rows)
  *    onto the encoded corpus and ranks with a windowed k-limit — no
  *    shuffle of the corpus, no UDF, nQueries never enters the plan size.
  */
object Pq {

  final case class Model(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def kCodes: Int = codebooks.head.length
    def dim: Int = m * subDim
  }

  private def corpus(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** All m subspace codes for one vector: first-index argmin per
    * codebook, exact doubles, deterministic (row-local, fixed loop
    * order). Static so generated code and interpreted eval share it. */
  def assignCodes(v: Array[Double], books: Array[Array[Array[Double]]]): Array[Int] = {
    val m = books.length
    val subDim = v.length / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = books(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var s = 0.0
        var i = 0
        while (i < subDim) { val d = v(j * subDim + i) - cent(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }

  /** Native encode expression — preference (b) from the build rules: the
    * fold-composition alternative is m × kCodes `aggregate` lambdas
    * (hundreds of Catalyst expressions) whose Janino compilation costs
    * seconds PER PLAN and dominated the query wall-clock; this node is
    * one static call inside whole-stage codegen, with the codebooks
    * shipped once as a generated-code reference object. */
  private[similarity] case class PqEncode(child: Expression,
                                          books: Array[Array[Array[Double]]])
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      ArrayData.toArrayData(
        assignCodes(input.asInstanceOf[ArrayData].toDoubleArray(), books))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
          s"graft.similarity.Pq.assignCodes($c.toDoubleArray(), $ref))")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def encodeCol(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), books))

  /** Train per-subspace codebooks with Lloyd iterations. Seeds are the
    * same md5-ranked rows for every subspace (their j-th slices), so the
    * whole model is a deterministic function of the corpus.
    */
  def fit(embeddings: DataFrame, m: Int = 8, kCodes: Int = 16,
          iters: Int = 2): Model =
    fitVectors(corpus(embeddings), m, kCodes, iters)

  /** [[fit]] on an already-prepared (vec_id, v) relation — the entry the
    * IVF-PQ composite uses to train codebooks on coarse RESIDUALS. */
  private[similarity] def fitVectors(e0: DataFrame, m: Int, kCodes: Int,
                                     iters: Int): Model = {
    require(m > 0 && kCodes > 0 && iters >= 0)
    val e = e0.select(col("vec_id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = e.select(size(col("v"))).head().getInt(0)
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      val subDim = dim / m
      val seeds = e
        .select(col("v"), md5(col("vec_id").cast("string")).as("h"), col("vec_id"))
        .orderBy(col("h"), col("vec_id")).limit(kCodes)
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      require(seeds.length == kCodes, s"corpus smaller than kCodes=$kCodes")
      var books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
        seeds.map(_.slice(j * subDim, (j + 1) * subDim))
      }
      // ONE aggregation job per Lloyd iteration for ALL m subspaces (a
      // per-subspace loop costs m sequential jobs whose fixed scheduling
      // overhead dominates the actual work): each row's codes come from
      // the native PqEncode expression, elements explode to (pos, x),
      // and the fixed-point means group by (subspace, code, sub-pos).
      for (_ <- 1 to iters) {
        val rows = e
          .select(encodeCol(col("v"), books).as("codes"), col("v"))
          .select(col("codes"), posexplode(col("v")).as(Seq("pos", "x")))
          .select(expr(s"pos div $subDim").cast("int").as("j"),
            element_at(col("codes"), expr(s"pos div $subDim").cast("int") + 1).as("cid"),
            (col("pos") % subDim).as("spos"), col("x"))
          .groupBy("j", "cid", "spos")
          .agg(sum((col("x") * lit(1.0e9)).cast("long")).as("s"),
            count(lit(1)).as("n"))
          .select(col("j"), col("cid"), col("spos"),
            (col("s").cast("double") / (col("n").cast("double") * lit(1.0e9)))
              .as("cv"))
          .collect()
        val means = rows.groupBy(_.getInt(0)).map { case (j, js) =>
          j -> js.groupBy(_.getInt(1)).map { case (cid, cs) =>
            cid -> cs.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
          }
        }
        books = books.zipWithIndex.map { case (cents, j) =>
          val jm = means.getOrElse(j, Map.empty[Int, Array[Double]])
          cents.zipWithIndex.map { case (old, ci) => jm.getOrElse(ci, old) }
        }
      }
      Model(subDim, books)
    } finally { e.unpersist(); () }
  }

  /** Row-local encode: (vec_id, codes array<int>), codes 0-based into
    * each subspace's codebook — one [[PqEncode]] call per row inside
    * whole-stage codegen. */
  def encode(embeddings: DataFrame, model: Model): DataFrame =
    corpus(embeddings).select(col("vec_id"),
      encodeCol(col("v"), model.codebooks).as("codes"))

  /** ADC top-k: queries are `vec_id < nQueries` (the corpus-query
    * convention shared with [[Ann.bruteForceTopK]]); per query a
    * m × kCodes lookup table of exact query→centroid distances is
    * computed on the driver, and ALL tables ship together as one small
    * broadcast relation (nQueries × m·kCodes doubles) joined once onto
    * the encoded corpus — nQueries is a DATA size, not a plan size (the
    * previous per-query literal-LUT branches union'd nQueries plan
    * copies: fine at 10, plan explosion at 10⁴). Each encoded row's
    * approximate distance is the sum of m lookups into the flattened
    * table — no decode; per-query top-k is a ranked-window filter
    * (WindowGroupLimit applies the k-limit below the shuffle). */
  def searchTopK(embeddings: DataFrame, model: Model, k: Int = 5,
                 nQueries: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = corpus(embeddings)
    val enc = encode(embeddings, model)
    val qs = e.filter(col("vec_id") < nQueries)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val kC = model.kCodes
    // flattened LUT row per query: lut[j*kCodes + c] = ||q_j − cent_{j,c}||²
    val luts = qs.toSeq.map { case (qid, qv) =>
      val lut = new Array[Double](model.m * kC)
      for (j <- 0 until model.m; c <- 0 until kC) {
        val cent = model.codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < model.subDim) {
          val d = qv(j * model.subDim + i) - cent(i); s += d * d; i += 1
        }
        lut(j * kC + c) = s
      }
      (qid, lut.toSeq)
    }.toDF("query_id", "lut")
    val dist = (0 until model.m).map { j =>
      element_at(col("lut"), lit(j * kC) + element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(asc("approx_l2sq"), asc("vec_id"))
    enc.join(broadcast(luts), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(dist, 6).as("approx_l2sq"))
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Oracle-checkable verdict query: the model/encode/search are
    * deterministic (see [[fit]]), so the quality verdicts are
    * deterministic booleans the DuckDB oracle pins TRUE — the same
    * estimator-contract pattern as `embed_pca`/`q_approx_distinct`.
    *
    * Quality metric: the DISTANCE RATIO — mean true L2² of the ADC
    * top-k over mean true L2² of the exact top-k, per query. (Recall@k
    * is the wrong dial on a near-uniform corpus: top-k membership is
    * decided by last-percent distance differences PQ deliberately
    * discards; the ratio measures what ADC actually promises — returned
    * candidates nearly as close as the true neighbors. Measured
    * 1.05–1.15 on the fixtures at both SFs; the 1.5 bound is a real
    * failure detector with wide margin.) `n_candidates` is data-derived
    * (min(topK, N−1)) so the oracle also cross-checks cardinality.
    */
  def pqChecked(embeddings: DataFrame, m: Int = 16, kCodes: Int = 16,
                topK: Int = 10, nQueries: Int = 10,
                maxDistRatio: Double = 1.5): DataFrame = {
    val model = fit(embeddings, m, kCodes)
    val pq = searchTopK(embeddings, model, topK, nQueries)
    val e = corpus(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val truth = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d), 6).as("l2sq"))
    val w = Window.partitionBy("query_id").orderBy(asc("l2sq"), asc("vec_id"))
    val exactAvg = truth.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .groupBy("query_id").agg(avg("l2sq").as("avg_exact"))
    val pqAvg = pq.join(truth, Seq("query_id", "vec_id"))
      .groupBy("query_id")
      .agg(avg("l2sq").as("avg_pq"), count(lit(1)).as("n_candidates"))
    val rangeRow = encode(embeddings, model)
      .agg(min(array_min(col("codes"))).as("mn"),
        max(array_max(col("codes"))).as("mx")).head()
    val rangeOk = rangeRow.getInt(0) >= 0 && rangeRow.getInt(1) < kCodes
    exactAvg.join(pqAvg, "query_id")
      .select(col("query_id"), col("n_candidates"),
        (col("avg_pq") <= col("avg_exact") * maxDistRatio).as("dist_ratio_ok"),
        lit(rangeOk).as("codes_in_range"))
  }

  /** IVF-PQ composite (the FAISS "IVFADC" construction, Jégou et al.
    * 2011 §IV): a coarse inverted-file quantizer prunes the corpus to
    * `nprobe` posting lists per query, and product-quantized RESIDUALS
    * (vector − assigned centroid) supply the in-list distances — the
    * production ANN layout at 100 TB, where neither an exhaustive ADC
    * scan ([[searchTopK]]) nor uncompressed postings ([[Ann.ivfTopK]])
    * fit the latency/memory budget on their own.
    *
    * Composition of two already-proven deterministic stages:
    *  - Coarse stage: [[Ann.ivfCentroids]]/[[Ann.nearestCentroids]] —
    *    the 1e-6-rounded-cosine assignment the `ann_topk_ivf` oracle
    *    replays bit-exactly in DuckDB.
    *  - Fine stage: [[fitVectors]] on the residual relation (md5 seeds,
    *    fixed-point Lloyd means) + the [[PqEncode]] codegen expression.
    *  - Search: one LUT row per (query, probed centroid) — exact
    *    residual-query→codeword distances, nQueries × nprobe rows of
    *    driver-side MODEL state — broadcast-joined onto the encoded
    *    postings on `cent_id`, which reproduces exactly the probed
    *    candidate pairs; ADC sum, windowed top-k under the group limit.
    *
    * Scale shape: the corpus is touched by (a) one coarse assignment
    * (broadcast centroids, per-row window over nlist candidate rows),
    * (b) one residual+encode projection, (c) one broadcast LUT join
    * whose output is only the probed lists. No corpus self-join, no
    * all-pairs anything; candidate volume is nprobe/nlist of the data.
    *
    * Verdict output (the estimator-contract oracle pattern): per query,
    *  - `n_candidates` — data-derived LEAST(topK, |probed lists \ self|),
    *    cross-checked by the oracle's own coarse replay;
    *  - `pq_ratio_ok` — mean true L2² of the ADC top-k ≤ `maxPqRatio` ×
    *    mean true L2² of the exact top-k WITHIN the probed candidates
    *    (isolates quantization distortion from probing loss);
    *  - `ivf_ratio_ok` — probed exact top-k mean ≤ `maxIvfRatio` × the
    *    global exact top-k mean (isolates probing loss);
    *  - `codes_in_range` — every emitted code in [0, kCodes).
    */
  def ivfPqChecked(embeddings: DataFrame, centroidStep: Int = 29,
                   nprobe: Int = 3, m: Int = 16, kCodes: Int = 16,
                   topK: Int = 10, nQueries: Int = 10,
                   maxPqRatio: Double = 1.5, maxIvfRatio: Double = 2.0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = graft.Caching.materialize(corpus(embeddings))
    val cents = Ann.ivfCentroids(e, centroidStep)
    // (vec_id, v, cent_id): every corpus vector in exactly one posting list
    val assigned = Ann.nearestCentroids(cents, e, "vec_id", "v", 1)
    // residual postings, materialized ONCE: codebook training (iters
    // aggregation passes) and the encode projection both read it
    val resid = graft.Caching.materialize(
      assigned.join(broadcast(cents), "cent_id")
        .select(col("vec_id"), col("cent_id"),
          zip_with(col("v"), col("cv"), (x, y) => x - y).as("v")))
    val model = fitVectors(resid.select("vec_id", "v"), m, kCodes, iters = 2)
    val kC = model.kCodes
    val enc = resid.select(col("vec_id"), col("cent_id"),
      encodeCol(col("v"), model.codebooks).as("codes"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = Ann.nearestCentroids(cents, q, "query_id", "qv", nprobe)
    // Driver-side LUTs — one per (query, probed centroid): residual-query
    // → codeword exact L2², nQueries·nprobe rows of bounded model state
    // (the searchTopK broadcast-LUT discipline, keyed by cent_id too).
    val probeRows = probes.join(broadcast(cents), "cent_id")
      .select(col("query_id"), col("cent_id"), col("qv"), col("cv"))
      .collect()
    val luts = probeRows.toSeq.map { r =>
      val qv = r.getSeq[Double](2).toArray
      val cv = r.getSeq[Double](3).toArray
      val rq = Array.tabulate(qv.length)(i => qv(i) - cv(i))
      val lut = new Array[Double](model.m * kC)
      for (j <- 0 until model.m; c <- 0 until kC) {
        val cent = model.codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < model.subDim) {
          val d = rq(j * model.subDim + i) - cent(i); s += d * d; i += 1
        }
        lut(j * kC + c) = s
      }
      (r.getLong(0), r.getLong(1), lut.toSeq)
    }.toDF("query_id", "cent_id", "lut")
    val dist = (0 until model.m).map { j =>
      element_at(col("lut"), lit(j * kC) + element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val wAdc = Window.partitionBy("query_id").orderBy(asc("approx_l2sq"), asc("vec_id"))
    // the cent_id equi-join IS the posting-list probe: candidates =
    // vectors whose one assigned list is among the query's nprobe lists
    val adcTop = enc.join(broadcast(luts), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(dist, 6).as("approx_l2sq"))
      .withColumn("__rk", row_number().over(wAdc)).filter(col("__rk") <= topK)
      .drop("__rk")
    // true distances (all query→corpus pairs; broadcast of nQueries rows)
    val truth = graft.Caching.materialize(
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, d) => acc + d), 6).as("l2sq")))
    val wTr = Window.partitionBy("query_id").orderBy(asc("l2sq"), asc("vec_id"))
    val globalAvg = truth.withColumn("rank", row_number().over(wTr))
      .filter(col("rank") <= topK)
      .groupBy("query_id").agg(avg("l2sq").as("avg_global"))
    val probePairs = probes.select("query_id", "cent_id")
      .join(assigned.select("vec_id", "cent_id"), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
    val probedAvg = truth.join(probePairs, Seq("query_id", "vec_id"))
      .withColumn("rank", row_number().over(wTr)).filter(col("rank") <= topK)
      .groupBy("query_id").agg(avg("l2sq").as("avg_probed"))
    val adcAvg = adcTop.join(truth, Seq("query_id", "vec_id"))
      .groupBy("query_id")
      .agg(avg("l2sq").as("avg_adc"), count(lit(1)).as("n_candidates"))
    val rangeRow = enc
      .agg(min(array_min(col("codes"))).as("mn"),
        max(array_max(col("codes"))).as("mx")).head()
    val rangeOk = rangeRow.getInt(0) >= 0 && rangeRow.getInt(1) < kC
    globalAvg.join(probedAvg, "query_id").join(adcAvg, "query_id")
      .select(col("query_id"), col("n_candidates"),
        (col("avg_adc") <= col("avg_probed") * maxPqRatio).as("pq_ratio_ok"),
        (col("avg_probed") <= col("avg_global") * maxIvfRatio).as("ivf_ratio_ok"),
        lit(rangeOk).as("codes_in_range"))
  }
}
