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
  * Per iteration: adjacent-symbol pairs explode from each word (weighted
  * by word frequency), one hash agg ranks them, the driver takes the top
  * pair (ONE collected row per iteration — bounded model state, the
  * kmeans-centroid pattern), and a fold expression rewrites each word's
  * symbol array with leftmost-greedy merging. The fold runs as a
  * row-local higher-order `aggregate` — no UDF, no shuffle. Ties break
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
    */
  def trainMerges(documents: DataFrame, numMerges: Int,
                  checkpointEvery: Int = 8): Seq[(Int, String, String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = documents.sparkSession
    // one corpus pass: vocabulary-sized (word, freq) table
    var words = documents
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    while (rank <= numMerges) {
      val pairs = words
        .select(col("freq"), explode(
          when(size(col("syms")) < 2, array().cast("array<struct<l:string,r:string>>"))
            .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(element_at(col("syms"), i + 1).as("l"),
                element_at(col("syms"), i + 2).as("r"))))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
      val top = pairs.orderBy(desc("n"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) {
        rank = numMerges + 1 // every word is a single symbol — done
      } else {
        val Row(l: String, r: String, n: Long) = top.head
        merges += ((rank, l, r, l + r, n))
        val prev = words
        words = prev
          .select(mergeOnce(col("syms"), l, r).as("syms"), col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        if (rank % checkpointEvery == 0) words = words.localCheckpoint()
        // materialize the new table BEFORE releasing its parent — persist
        // is lazy, and unpersisting prev first would force every later
        // action to rebuild the whole fold chain back to the last
        // checkpoint (O(checkpointEvery²) re-evaluations of pure waste)
        words.count()
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Encode a single word with an ordered merge table — the driver-side
    * reference encoder (tests, interactive use). Corpus-scale encoding
    * broadcasts the merge list and maps partitions with exactly this
    * function.
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
