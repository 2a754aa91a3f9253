package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding corpus — the dimensionality
  * reduction / whitening step embedding pipelines run before indexing
  * (a 64→16 projection cuts ANN memory 4× at minor recall cost).
  *
  * Scale shape, mirroring MLlib's RowMatrix PCA:
  *  - The GRAM/COVARIANCE matrix is dim×dim (64×64 = 4 KB of longs) —
  *    model state. It accumulates in one `mapPartitions` pass over the
  *    corpus (per-partition local array, no shuffle of per-row outer
  *    products) and reduces by entrywise sum.
  *  - Accumulation is FIXED-POINT: each centered product is truncated to
  *    1e-9 units and summed as exact longs, so the covariance — and
  *    therefore every eigenvector — is bit-identical regardless of
  *    partitioning or execution order (float partial sums would make
  *    the "same" PCA differ run to run). Long range caps corpus size at
  *    ~10⁹ unit-scale rows per entry; shard entries beyond that.
  *  - The eigendecomposition runs on the DRIVER (cyclic Jacobi, 64×64 —
  *    microseconds); eigenvectors re-broadcast as literal arrays for the
  *    row-local projection, exactly like the k-means centroids.
  *
  * Sign convention: each component's largest-|coordinate| entry is made
  * positive (eigenvector sign is otherwise arbitrary and would flip
  * between runs of different sweep orders).
  */
object Pca {

  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  private val Scale = 1.0e9

  /** Fit the top-k principal components. */
  def fit(embeddings: DataFrame, k: Int): Model = {
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = e.select(size(col("v"))).head().getInt(0)
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")

    // exact fixed-point mean (the labelCentroids scheme)
    val meanRow = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum((col("x") * Scale).cast("long")).as("s"), count(lit(1)).as("n"))
      .select(col("pos"), (col("s").cast("double") / (col("n").cast("double") * Scale)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val mean = Array.tabulate(dim)(meanRow(_))
    val bcMean = e.sparkSession.sparkContext.broadcast(mean)

    // covariance upper triangle in 1e-9-unit longs: one pass, no shuffle
    // of row-sized data — each partition reduces to dim*(dim+1)/2 longs
    val nTri = dim * (dim + 1) / 2
    val (cov, n) = e.select(col("v")).rdd
      .mapPartitions { it =>
        val mu = bcMean.value
        val acc = new Array[Long](nTri)
        var cnt = 0L
        it.foreach { row =>
          val v = row.getSeq[Double](0)
          val c = Array.tabulate(dim)(i => v(i) - mu(i))
          var t = 0
          var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) {
              acc(t) += (c(i) * c(j) * Scale).toLong
              t += 1; j += 1
            }
            i += 1
          }
          cnt += 1
        }
        Iterator((acc, cnt))
      }
      .reduce { case ((a, na), (b, nb)) =>
        var i = 0
        while (i < nTri) { a(i) += b(i); i += 1 }
        (a, na + nb)
      }
    require(n > 1, "PCA needs at least two rows")

    val covM = Array.ofDim[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      val v = cov(t) / Scale / (n - 1)
      covM(i)(j) = v; covM(j)(i) = v
      t += 1
    }

    val (values, vectors) = jacobiEigen(covM)
    // sort by eigenvalue desc; pin each vector's sign
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { idx =>
      val vec = Array.tabulate(dim)(r => vectors(r)(idx))
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(-_) else vec
    }.toArray
    Model(mean, comps, order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns matrix). Deterministic: fixed
    * sweep order, fixed convergence threshold.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
                                      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-12) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          val tSign = if (theta >= 0) 1.0 else -1.0
          val tTan = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1))
          val c = 1 / math.sqrt(tTan * tTan + 1)
          val s = tTan * c
          for (i <- 0 until n) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until n) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until n) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Oracle-checkable invariant summary of the whole fit+project path.
    * Eigenvectors are corpus-dependent model state no second engine can
    * reproduce bit-for-bit, so the differential contract is: (a)
    * data-derived metrics both engines compute exactly (row count,
    * dimensionality, total corpus variance in 1e-9 fixed-point units —
    * the same truncation scheme the fit itself uses, replayable in ANSI
    * SQL), and (b) mathematical invariants any correct PCA must satisfy,
    * emitted as 1.0/0.0 verdicts: component orthonormality, eigenvalues
    * sorted non-increasing and non-negative, explained-variance ratio in
    * (0, 1], and the variance of the projected first coordinate equal to
    * the top eigenvalue (ties the distributed projection back to the
    * model). The oracle pins the expected verdicts; a broken fit flips a
    * bit and fails the hash. Long fixed-point total-variance caps at
    * ~10⁹ unit-scale elements per the fit's own documented bound.
    */
  def invariants(embeddings: DataFrame, k: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = fit(embeddings, k)
    val e = embeddings.select(col("embedding").cast("array<double>").as("v"))

    // exact fixed-point total variance: replayed verbatim by the oracle
    val ex = e.select(posexplode(col("v")).as(Seq("pos", "x")))
    val mu = ex.groupBy("pos")
      .agg(sum((col("x") * Scale).cast("long")).as("s"), count(lit(1)).as("n"))
      .select(col("pos"),
        (col("s").cast("double") / (col("n").cast("double") * Scale)).as("m"))
    val totalVarNano = ex.join(mu, "pos")
      .agg(sum(((col("x") - col("m")) * (col("x") - col("m")) * Scale).cast("long")))
      .head().getLong(0)
    val nRows = e.count()

    // model-state invariants: k×dim driver arrays, microseconds
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val orthoErr = (for (i <- 0 until k; j <- i until k) yield
      math.abs(dot(model.components(i), model.components(j)) -
        (if (i == j) 1.0 else 0.0))).max
    val eigsOk = model.eigenvalues.zip(model.eigenvalues.drop(1))
      .forall { case (a, b) => a >= b - 1e-12 } && model.eigenvalues.last >= -1e-12
    val totalVar = totalVarNano.toDouble / Scale / (nRows - 1)
    val ratio = model.eigenvalues.sum / totalVar
    val pc1Var = project(embeddings, model).agg(variance(col("pc1"))).head().getDouble(0)
    val projOk = math.abs(pc1Var - model.eigenvalues.head) <=
      1e-4 * math.max(model.eigenvalues.head, 1e-9)

    Seq(
      ("n_rows", nRows.toDouble),
      ("dim", model.dim.toDouble),
      ("k", k.toDouble),
      ("total_var_nano", totalVarNano.toDouble),
      ("orthonormal_ok", if (orthoErr <= 1e-9) 1.0 else 0.0),
      ("eigs_desc_ok", if (eigsOk) 1.0 else 0.0),
      ("explained_ratio_in_01", if (ratio > 0 && ratio <= 1 + 1e-9) 1.0 else 0.0),
      ("proj_var_matches_eig", if (projOk) 1.0 else 0.0)
    ).toDF("metric", "value")
  }

  /** Row-local projection onto the fitted components: one fused
    * zip_with/aggregate fold per component against literal arrays —
    * no shuffle, scales with scan bandwidth. Output coordinates are
    * rounded to 1e-6 (the cross-engine float-fold convention).
    */
  def project(embeddings: DataFrame, model: Model): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val meanLit = array(model.mean.map(lit): _*)
    // centered vector staged as a bound attribute: k components each walk
    // it once instead of re-centering per fold (lambda-CSE rule)
    val staged = embeddings.select(col("vec_id"),
      zip_with(v, meanLit, (x, m) => x - m).as("__c"))
    val coords = model.components.zipWithIndex.map { case (comp, i) =>
      round(aggregate(zip_with(col("__c"), array(comp.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, d) => acc + d), 6).as(s"pc${i + 1}")
    }
    staged.select(col("vec_id") +: coords: _*)
  }
}
