package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL'16) —
  * the subword-vocabulary step of every modern LM tokenizer, in its
  * standard formulation: merges are learned over the WORD-TYPE frequency
  * table, not the running corpus. That is the scale property that makes
  * distributed BPE cheap: one corpus pass builds (word, freq) — vocabulary-
  * sized, millions of rows where the corpus has trillions of tokens — and
  * every training iteration touches only that table.
  *
  * Per round: adjacent-symbol pairs explode from each word (weighted
  * by word frequency), one hash agg ranks them, the driver takes the top
  * batchSize+1 pairs (bounded model state, the kmeans-centroid pattern)
  * and accepts a provably-sequential batch of them (see [[trainMerges]]),
  * and one chained fold expression rewrites each word's symbol array with
  * leftmost-greedy merging, rule by rule in rank order. The folds run as
  * row-local higher-order `aggregate`s — no UDF, no shuffle. Ties break
  * (count desc, left asc, right asc) so the merge table is deterministic
  * under any partitioning (the spec asserts it).
  *
  * Iterative lineage is truncated with `localCheckpoint` every
  * `checkpointEvery` merges, the star-contraction discipline — without it
  * the plan tree doubles per merge.
  *
  * Word symbols start as characters with the conventional `</w>`
  * end-of-word marker folded into the last character, so merges can
  * distinguish word-final from word-internal pairs.
  */
object Bpe {

  /** End-of-word marker appended to each word's final symbol. */
  val Eow = "</w>"

  private def initialSymbols(word: Column): Column = {
    val chars = split(word, "")
    transform(chars, (c, i) =>
      when(i === size(chars) - 1, concat(c, lit(Eow))).otherwise(c))
  }

  /** Leftmost-greedy single-rule merge of a symbol array: fold state is
    * (emitted prefix, pending symbol); a (pend=left, s=right) match emits
    * the merged symbol and clears the pending slot, so overlapping
    * occurrences ("aaa" under a+a) merge left-to-right exactly as the
    * reference implementation does.
    */
  private[text] def mergeOnce(symbols: Column, left: String, right: String): Column = {
    val merged = left + right
    val folded = aggregate(
      symbols,
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("pend")),
      (acc, s) => {
        val out = acc.getField("out"); val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === left && s === right,
            struct(concat(out, array(lit(merged))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), s.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
    folded
  }

  /** Train `numMerges` merge rules. Returns the ordered merge table:
    * (rank, left, right, merged, pair_count).
    *
    * Merges are selected in PROVABLY-SEQUENTIAL batches of up to
    * `batchSize` per Spark round (one pair-count job + one rewrite job
    * apply up to B merges, vs one pair of jobs PER merge — a 32 k-merge
    * vocab stops being 32 k sequential job pairs). A batch is the
    * CONTIGUOUS top of the (count desc, l asc, r asc)-sorted pair table
    * that is (a) pairwise symbol-disjoint — merging one pair then cannot
    * create or destroy occurrences of another (a merge only affects
    * adjacencies touching its own symbols, and `c⋅d` can't become
    * adjacent unless the merged pair sat BETWEEN them, which contradicts
    * adjacency) — and (b) strictly above the next pair's count. (b) makes
    * the equivalence exact despite new pairs: a pair created by an
    * applied merge inherits at most its parent pair's count, the parent
    * shares a symbol with an applied merge so it is OUTSIDE the disjoint
    * prefix, hence its count is ≤ the boundary count < every accepted
    * count — it can never overtake a later batch member, not even on a
    * tie-break. A batch of 1 is trivially the sequential step, so the
    * shrink loop always terminates with a valid batch.
    */
  def trainMerges(documents: DataFrame, numMerges: Int,
                  checkpointEvery: Int = 8,
                  batchSize: Int = 8): Seq[(Int, String, String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(batchSize >= 1, "batchSize must be >= 1")
    // one corpus pass: vocabulary-sized (word, freq) table
    var words = documents
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var sinceCheckpoint = 0
    while (rank <= numMerges) {
      val b = math.min(batchSize, numMerges - rank + 1)
      val pairs = words
        .select(col("freq"), explode(
          when(size(col("syms")) < 2, array().cast("array<struct<l:string,r:string>>"))
            .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(element_at(col("syms"), i + 1).as("l"),
                element_at(col("syms"), i + 2).as("r"))))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
      // b+1 rows of driver state: the boundary row drives guard (b)
      val cand = pairs.orderBy(desc("n"), asc("l"), asc("r")).limit(b + 1).collect()
      if (cand.isEmpty) {
        rank = numMerges + 1 // every word is a single symbol — done
      } else {
        // (a) contiguous symbol-disjoint prefix — STOP at the first
        // conflict (skipping would break the count-dominance argument)
        val used = scala.collection.mutable.Set.empty[String]
        var k = 0
        var conflict = false
        while (!conflict && k < math.min(b, cand.length)) {
          val l = cand(k).getString(0); val r = cand(k).getString(1)
          if (used.contains(l) || used.contains(r)) conflict = true
          else { used += l; used += r; k += 1 }
        }
        // (b) strict count drop at the batch boundary; k=1 is always safe
        while (k >= 2 && k < cand.length && cand(k - 1).getLong(2) == cand(k).getLong(2))
          k -= 1
        val batch = cand.take(k)
        batch.foreach { row =>
          val Row(l: String, r: String, n: Long) = row
          merges += ((rank, l, r, l + r, n))
          rank += 1
        }
        // ONE rewrite job: the k rules chain left-to-right in rank order,
        // each fold applied leftmost-greedily — exactly the sequential
        // semantics, k-at-a-time
        val newSyms = batch.foldLeft(col("syms")) { (c, row) =>
          mergeOnce(c, row.getString(0), row.getString(1))
        }
        val staged = words.select(newSyms.as("syms"), col("freq"))
        val prev = words
        sinceCheckpoint += k
        words = if (sinceCheckpoint >= checkpointEvery) {
          sinceCheckpoint = 0
          // eager localCheckpoint materializes (and stores) the new table
          // itself — no extra persist, so nothing leaks in the cache when
          // the pre-checkpoint plan is dropped
          staged.localCheckpoint()
        } else {
          // materialize BEFORE releasing the parent — persist is lazy, and
          // unpersisting prev first would force every later action to
          // rebuild the whole fold chain back to the last checkpoint
          val cached = staged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached.count()
          cached
        }
        prev.unpersist()
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Single-node reference trainer — Sennrich et al.'s algorithm
    * verbatim over an in-memory corpus: word-type counts, best adjacent
    * pair by (count desc, pair asc), leftmost-greedy merge. For literal
    * fixture corpora and model bootstrapping on the driver; the
    * corpus-scale trainer is [[trainMerges]] (BpeSpec proves the two
    * produce identical merge tables).
    */
  def trainMergesLocal(corpus: Seq[String],
                       numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        val syms = w.map(_.toString).toVector
        syms.updated(syms.length - 1, syms.last + Eow) -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairCounts = words.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> f }.toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), n) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, l + r, n))
        words = words.toSeq.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var pend: String = null
          syms.foreach { s =>
            if (pend == null) pend = s
            else if (pend == l && s == r) { merged += l + r; pend = null }
            else { merged += pend; pend = s }
          }
          if (pend != null) merged += pend
          merged.result() -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Corpus-scale BPE encode statistics: apply an ordered merge table to
    * every whitespace token of every document, returning per document
    * (doc_id, n_words, n_bpe_tokens).
    *
    * Each token becomes a delimiter-wrapped symbol string
    * `(c)(c)…(c</w>)`, and each merge rule is ONE codegen string
    * replace `(l)(r)` → `(lr)` — non-overlapping left-to-right
    * replacement over exclusive per-symbol wrappers is exactly
    * leftmost-greedy BPE merging, so the chain reproduces
    * [[encodeWord]] rule for rule with no UDF and no shuffle before the
    * final per-document aggregation. The same chain replays verbatim in
    * any engine with SQL `replace` (the DuckDB oracle does).
    *
    * Tokens not matching `tokenPattern` are excluded on both engines —
    * the default guards the delimiter characters `(`/`)` and the
    * `</w>` marker from colliding with token content.
    */
  def encodeCorpus(documents: DataFrame,
                   merges: Seq[(Int, String, String, String, Long)],
                   tokenPattern: String = "^[a-z]+$"): DataFrame = {
    import org.apache.spark.sql.functions.{replace => sreplace}
    val staged = documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(tokenPattern))
      .select(col("doc_id"), regexp_replace(col("word"), "(.)", "($1)").as("w"))
    val sym0 = concat(expr("substring(w, 1, length(w) - 1)"), lit(Eow + ")"))
    val encoded = merges.sortBy(_._1).foldLeft(sym0) { case (c, (_, l, r, m, _)) =>
      sreplace(c, lit(s"($l)($r)"), lit(s"($m)"))
    }
    staged
      .select(col("doc_id"),
        (length(encoded) - length(sreplace(encoded, lit("("), lit("")))).as("n_sym"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).cast("long").as("n_bpe_tokens"))
  }

  /** Tokenizer fertility by source: characters per BPE token for each
    * corpus slice — THE tokenizer-health metric (a source whose fertility
    * collapses toward 1 is being shattered into characters: the
    * vocabulary doesn't fit it, its effective context shrinks, and its
    * training cost per character balloons). Same merge-table replace
    * chain as [[encodeCorpus]], aggregated per `source` with the exact
    * word-character total carried alongside, fertility micro-quantized
    * by integer division (the hash-compared column) plus one
    * fixed-form double.
    *
    * Scale: identical to encodeCorpus — a per-row replace chain (no
    * UDF, no shuffle before the per-source aggregation ≤ |sources|).
    */
  def fertilityBySource(documents: DataFrame,
                        merges: Seq[(Int, String, String, String, Long)],
                        tokenPattern: String = "^[a-z]+$"): DataFrame = {
    import org.apache.spark.sql.functions.{replace => sreplace}
    val staged = documents
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(tokenPattern))
      .select(col("source"), length(col("word")).as("n_chars"),
        regexp_replace(col("word"), "(.)", "($1)").as("w"))
    val sym0 = concat(expr("substring(w, 1, length(w) - 1)"), lit(Eow + ")"))
    val encoded = merges.sortBy(_._1).foldLeft(sym0) { case (c, (_, l, r, m, _)) =>
      sreplace(c, lit(s"($l)($r)"), lit(s"($m)"))
    }
    staged
      .select(col("source"), col("n_chars"),
        (length(encoded) - length(sreplace(encoded, lit("("), lit("")))).as("n_sym"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars")).cast("long").as("n_word_chars"),
        sum(col("n_sym")).cast("long").as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_word_chars"),
        col("n_bpe_tokens"),
        expr("(1000000 * n_word_chars) div n_bpe_tokens").as("fertility_micro"),
        (floor(col("n_word_chars").cast("double") /
          col("n_bpe_tokens").cast("double") * 1e6 + 0.5) / 1e6).as("fertility"))
  }

  /** Encode a single word with an ordered merge table — the driver-side
    * reference encoder (tests, interactive use; [[encodeCorpus]] is the
    * distributed equivalent, spec-proven to agree).
    */
  def encodeWord(word: String, merges: Seq[(Int, String, String, String, Long)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toVector
    syms = syms.updated(syms.length - 1, syms.last + Eow)
    merges.sortBy(_._1).foreach { case (_, l, r, m, _) =>
      val out = Vector.newBuilder[String]
      var pend: String = null
      syms.foreach { s =>
        if (pend == null) pend = s
        else if (pend == l && s == r) { out += m; pend = null }
        else { out += pend; pend = s }
      }
      if (pend != null) out += pend
      syms = out.result()
    }
    syms
  }
}
