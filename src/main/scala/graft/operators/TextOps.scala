package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable

/** Text-analysis + near-duplicate operators for large-scale training-data
  * pipelines (the north-star extensions, SURVEY §7.1.8). Not present in
  * the reference — designed Spark-first for the `documents` table.
  *
  * Design rules:
  *  - everything is array/higher-order-function math over the token
  *    array — map-only, stays in whole-stage codegen, no UDFs;
  *  - hashes use [[Portable.portable32]] (md5-derived) so MinHash /
  *    SimHash signatures are bit-identical in the DuckDB oracle;
  *    a production deployment would flip to xxhash64 ([[Portable.fast64]])
  *    — one constant, same plan shape;
  *  - pair generation never goes quadratic: LSH banding buckets
  *    candidates, and only candidates pay the exact-similarity check.
  */
object TextOps {

  /** Whitespace tokens (documents are space-separated lowercase words). */
  def tokens(c: Column): Column = split(c, " ")

  private val stopEn = Seq("the", "a", "of", "and", "to")
  private val stopEs = Seq("el", "la", "los", "de", "y")
  private val stopDe = Seq("der", "die", "das", "und", "zu")

  private def countIn(arr: Column, words: Seq[String]): Column =
    size(filter(arr, t => t.isin(words.map(lit): _*)))

  /** Token statistics per language (token counting over the corpus). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"), tokens(col("text")).as("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("w")).cast("long")).as("total_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy("lang")

  /** Per-document quality scoring: token count, type-token ratio,
    * stopword ratio, mean token length — the length/stopword heuristics
    * of LLM corpus filtering. Pure integer ratios → deterministic. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("type_token_ratio"),
        (countIn(col("w"), stopEn).cast("double") / size(col("w")))
          .as("stopword_ratio"),
        (col("n_chars").cast("double") / size(col("w"))).as("mean_token_len"))
      .orderBy("doc_id")

  /** Language identification via stopword-marker scoring with a fixed
    * argmax tiebreak (en > es > de). A char-n-gram model would slot in
    * the same shape; scoring stays map-only either way. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("lang"),
        countIn(col("w"), stopEn).as("score_en"),
        countIn(col("w"), stopEs).as("score_es"),
        countIn(col("w"), stopDe).as("score_de"))
      .withColumn("predicted",
        when(col("score_en") >= col("score_es")
          && col("score_en") >= col("score_de"), "en")
          .when(col("score_es") >= col("score_de"), "es")
          .otherwise("de"))
      .select("doc_id", "lang", "score_en", "score_es", "score_de", "predicted")
      .orderBy("doc_id")

  /** Document fingerprint: md5 over whitespace-normalized text (exact
    * near-canonical dedup key; the rolling-hash analogue at corpus scale). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .orderBy("doc_id")

  // ---- shingles + MinHash -------------------------------------------------

  /** Word 3-shingles; documents shorter than 3 tokens fall back to the
    * whole text as a single shingle. */
  def shingles(textCol: Column): Column = {
    val w = split(textCol, " ")
    when(size(w) < 3, array(textCol)).otherwise(
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1),
          element_at(w, i + 2), element_at(w, i + 3))))
  }

  val MinhashSeeds = 8

  /** One MinHash value: min portable hash of `shingle + "#" + seed`. */
  private def minhashCol(sh: Column, seed: Int): Column =
    array_min(transform(sh,
      s => Portable.portable32(concat(s, lit(s"#$seed")))))

  /** MinHash signatures (8 hashes) per document — map-only, no shuffle;
    * the oracle recomputes the identical signature in SQL. */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val mh = (0 until MinhashSeeds).map(i => minhashCol(col("sh"), i).as(f"mh$i"))
    base.select(col("doc_id") +: mh: _*).orderBy("doc_id")
  }

  /** MinHash + LSH near-duplicate pairs: 4 bands × 2 rows; candidate
    * pairs share at least one full band, then pay an exact shingle-set
    * Jaccard check at `threshold`. The self-join runs on band keys
    * (shuffle on tiny band hashes, never all-pairs); exact Jaccard only
    * touches candidates. */
  def minhashNearDups(spark: SparkSession, dir: String,
      threshold: Double = 0.7): DataFrame = {
    val sig = minhashSignature(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(shingles(col("text"))).as("shs"))

    val bands = (0 until MinhashSeeds / 2).map(b =>
      struct(lit(b).as("band"), col(s"mh${2 * b}").as("h1"),
        col(s"mh${2 * b + 1}").as("h2")))
    val exploded = sig.select(col("doc_id"),
      explode(array(bands: _*)).as("bk"))

    val l = exploded.select(col("doc_id").as("ida"), col("bk").as("bka"))
    val r = exploded.select(col("doc_id").as("idb"), col("bk").as("bkb"))
    val cand = l.join(r, col("bka") === col("bkb") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()

    val da = docs.select(col("doc_id").as("ida"), col("shs").as("sha"))
    val db = docs.select(col("doc_id").as("idb"), col("shs").as("shb"))
    cand.join(da, "ida").join(db, "idb")
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double")
          / size(array_union(col("sha"), col("shb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), graft.util.Portable.val6(col("jaccard")).as("jaccard"))
      .orderBy("ida", "idb")
  }

  /** Bounded all-pairs n-gram Jaccard (the exact quadratic baseline the
    * LSH path approximates — capped to a fixed id range so cost is
    * constant at any scale factor). */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      maxId: Long = 200, threshold: Double = 0.2): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId)
      .select(col("doc_id"), array_distinct(shingles(col("text"))).as("shs"))
    val a = d.select(col("doc_id").as("ida"), col("shs").as("sha"))
    val b = d.select(col("doc_id").as("idb"), col("shs").as("shb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double")
          / size(array_union(col("sha"), col("shb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), graft.util.Portable.val6(col("jaccard")).as("jaccard"))
      .orderBy("ida", "idb")
  }

  // ---- SimHash ------------------------------------------------------------

  val SimhashBits = 32

  /** 32-bit SimHash per document, computed entirely with array
    * higher-order functions (no explode, no shuffle): bit b is set when
    * at least half the token hashes have bit b set. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val hs = transform(tokens(col("text")), t => Portable.portable32(t))
    val n = size(col("hs"))
    val bitCols = (0 until SimhashBits).map { b =>
      val pow: Long = 1L << b
      val cnt = size(filter(col("hs"),
        h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L))
      when(cnt * 2 >= n, lit(pow)).otherwise(lit(0L))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }
}
