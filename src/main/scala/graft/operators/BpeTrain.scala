package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q206 — distributed BPE merge TRAINING (Sennrich et al., ACL'16 — the
  * public byte-pair-encoding algorithm every modern tokenizer family
  * builds on). q183 APPLIES a fixed subword vocabulary; this operator
  * LEARNS one from the corpus: the k highest-count adjacent symbol
  * pairs, merged greedily one per round.
  *
  * The production trick (identical to how sentencepiece/HF trainers
  * scale): pair statistics do NOT run over the corpus — they run over
  * the WORD VOCABULARY weighted by word frequency. The corpus-sized
  * work is exactly one aggregation (word → freq, map-side combined);
  * every merge round then operates on vocab-grain rows (distinct words
  * only), which for natural text is orders of magnitude smaller and
  * SHRINKS nothing at 100 TB — vocabulary growth is sublinear in corpus
  * size (Heaps' law), so round cost is effectively constant while the
  * one corpus pass parallelizes perfectly.
  *
  * Determinism contract: a merge round's argmax breaks ties by
  * (count DESC, left ASC, right ASC) — a total order, so the learned
  * merge table is a pure function of the corpus. Self-pairs (l = r) are
  * excluded from candidacy: with l ≠ r, simultaneous leftmost
  * non-overlapping merge application has NO overlap ambiguity (a match
  * at j requires syms[j] = l, a match at j−1 requires syms[j] = r), so
  * the positional rebuild is order-independent and engine-portable —
  * the oracle replays the identical CASE per position.
  *
  * CONTRACT LIMITATION — deviation from stock BPE: Sennrich et al.
  * (and sentencepiece/HF trainers) DO admit self-pairs, merging runs
  * like "aa"/"ee" leftmost-greedily (⌊run/2⌋ merges per run). On a
  * corpus whose global argmax is a self-pair, this trainer's merge
  * table therefore differs from a stock trainer's from that round on.
  * The exclusion is deliberate: it is what makes the round rebuild a
  * position-independent relational map (portable to any engine, and to
  * the DuckDB oracle) instead of a per-word sequential scan. Natural-
  * language corpora put character self-pairs far below the top digram
  * counts in early rounds, so the learned table matches stock BPE in
  * practice; a consumer needing bit-exact sentencepiece parity should
  * treat the merge table, not the trainer, as the interchange artifact.
  *
  * Driver-side state per round is one argmax row + one count —
  * metadata-sized by design, like the k-means centroid loop (q76).
  * `localCheckpoint` truncates the per-round lineage so round N does
  * not replay rounds 1..N−1 (the Graphs.components discipline).
  */
object BpeTrain {

  def bpeMerges(spark: SparkSession, dir: String,
      iters: Int = 8): DataFrame =
    bpeMergesFrom(Tables.documents(spark, dir), iters)

  /** q207 — APPLY the trained merges back to the corpus: per language,
    * word/char/piece volumes and the chars-per-piece compression ratio
    * — the number a tokenizer ships with (how many symbols a model
    * actually pays per character of text). Train and apply share one
    * loop; the application itself is a word-grain join (the segmented
    * vocabulary maps back onto token occurrences — the q183 discipline:
    * never re-segment per occurrence), then integer reductions at
    * language grain. */
  def bpeApply(spark: SparkSession, dir: String,
      iters: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (vocab, _) = trainLoop(docs, iters)
    val pieces = vocab.select(col("word"),
      size(col("syms")).cast("long").as("n_pieces"))
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(pieces, "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_pieces"),
        graft.util.Portable.val6(
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy("lang")
  }

  /** Core trainer over any corpus with a `text` column — reused by the
    * spec's hand-computed merge-sequence proof. */
  private[graft] def bpeMergesFrom(docs: DataFrame,
      iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, out) = trainLoop(docs, iters)
    out.toDF("iteration", "left_sym", "right_sym", "n_sites", "vocab_size")
      .orderBy("iteration")
  }

  /** The greedy loop: returns (final segmented vocabulary, per-round
    * merge stats). */
  private def trainLoop(docs: DataFrame,
      iters: Int): (DataFrame, Seq[(Int, String, String, Long, Long)]) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // the ONE corpus-sized pass: word frequencies, then chars
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
      .localCheckpoint()

    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    for (it <- 1 to iters) {
      val syms = col("syms")
      val best = vocab.filter(size(syms) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(syms) - 1),
            j => struct(element_at(syms, j).as("l"),
              element_at(syms, j + 1).as("r")))).as("p"))
        .filter(col("p.l") =!= col("p.r"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()(0)
      val (l0, r0, cnt) =
        (best.getString(0), best.getString(1), best.getLong(2))
      val lL = lit(l0); val rL = lit(r0)

      vocab = vocab.withColumn("syms",
        filter(
          transform(sequence(lit(1), size(syms)), j => {
            // prev guarded (element_at index 0 is an error in ANSI
            // Spark; the when() branch value only evaluates at j > 1),
            // next via try_element_at (index past the end must be NULL
            // — DuckDB's syms[j+1] semantics; NULL = r is never true)
            val cur = element_at(syms, j)
            val prev: Column = when(j > lit(1), element_at(syms, j - 1))
            val nxt = try_element_at(syms, j + 1)
            when(prev === lL && cur === rL, lit(null).cast("string"))
              .when(cur === lL && nxt === rL, concat(cur, nxt))
              .otherwise(cur)
          }),
          x => x.isNotNull))
        .localCheckpoint()
      val vocabSize =
        vocab.select(explode(col("syms")).as("s")).distinct().count()
      out += ((it, l0, r0, cnt, vocabSize))
    }
    (vocab, out.toSeq)
  }
}
