package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Regex tokenization à la BPE pre-tokenizers: split into letter
    * runs, digit runs, and single punctuation marks (the class structure
    * GPT-2-style pre-tokenizers use before merges). The pattern sticks
    * to constructs with identical semantics in Java regex (Spark,
    * codegen'd) and RE2 (DuckDB), so counts are oracle-exact. All
    * scan-local projection — no shuffle until the output sort. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame = {
    def n(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        n("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]").as("n_regex_tokens"),
        n("[0-9]+").as("n_numeric"),
        n("[^a-zA-Z0-9\\s]").as("n_punct"))
      .orderBy("doc_id")
  }

  /** Generator/UDTF surface: one row per (document, position, token)
    * via `posexplode` — the lateral-view shape every tokenize-then-
    * process pipeline starts with. Bounded to a doc subset here purely
    * to keep the oracle result small; the operator itself is a
    * scan-local generate (rows fan out in place, no shuffle). */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "token")
      .orderBy("doc_id", "pos")

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

  /** The sentiment lexicon: token → signed weight. A driver constant
    * (real lexicons are a few thousand entries — still a broadcast-able
    * constant), deterministic, shared verbatim by the q164 oracle. */
  private[graft] val sentimentLex: Seq[(String, Long)] = Seq(
    "fast" -> 2L, "value" -> 1L, "big" -> 1L, "slow" -> -2L, "dup" -> -1L)

  /** Lexicon-based sentiment scoring (q164) — the last §7 text-analysis
    * signal: per document, the signed sum of token weights from a fixed
    * lexicon, its length-normalized score, and a 3-way label. The scan
    * stays LOCAL: the lexicon folds into one `aggregate` lambda (a CASE
    * per token — no explode, no join, no shuffle until the output
    * sort), the same shape every keyword/abuse/topic lexicon scorer
    * takes. At a lexicon too large for a CASE chain the same contract
    * is an explode + BROADCAST lexicon join — the oracle states that
    * form (token unnest ⋈ VALUES), so the gate also proves the two
    * formulations equivalent. */
  def sentimentLexiconScore(spark: SparkSession, dir: String): DataFrame = {
    def wt(t: Column): Column = sentimentLex
      .foldLeft(when(lit(false), lit(0L))) {
        case (c, (s, v)) => c.when(t === s, lit(v))
      }.otherwise(lit(0L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + wt(t))
          .as("sentiment_raw"))
      .withColumn("sentiment", graft.util.Portable.val6(
        col("sentiment_raw").cast("double") / col("n_tokens").cast("double")))
      .withColumn("label",
        when(col("sentiment_raw") > 0, "positive")
          .when(col("sentiment_raw") < 0, "negative")
          .otherwise("neutral"))
      .orderBy("doc_id")
  }

  /** The project's content-identity contract: md5 over lowercased,
    * whitespace-collapsed text. ONE definition — q30 (fingerprint),
    * q147 (streaming dedup key) and q150 (snapshot diff) all derive
    * their keys from this exact expression, so a normalization tweak
    * can never desynchronize them. */
  def contentFp(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: md5 over whitespace-normalized text (exact
    * near-canonical dedup key; the rolling-hash analogue at corpus scale). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), contentFp(col("text")).as("fp"))
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

  /** The near-dup similarity contract — ONE definition shared by the
    * full chain (q33/q65/q145), the incremental paths (q157/q158's
    * curation twin) and their equality proofs, so the threshold can
    * never drift one-sided and silently break incremental ≡ full. */
  val NearDupJaccard = 0.7

  /** The benchmark-registry membership rule (doc_id ≡ 0 mod this) —
    * shared by decontaminate (q142), the curation chain (q145) and the
    * incremental path (q157) for the same no-drift reason. */
  val EvalMod = 25

  /** Universal-hash family over the base 32-bit shingle hash:
    * h_i(x) = (a_i·h(x) + b_i) mod P with P prime > 2^32. The base md5
    * hash runs ONCE per shingle (md5 through an interpreted lambda is
    * the expensive part — 8× fewer evaluations); deriving the family is
    * pure integer arithmetic, identical in the DuckDB oracle. */
  val MinhashP: Long = 4294967311L
  val MinhashA: Seq[Long] = Seq(1000003L, 1000033L, 1000037L, 1000039L,
    1000081L, 1000099L, 1000117L, 1000121L)
  val MinhashB: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** Typed per-document signature row. */
  case class DocSig(doc_id: Long, shs: Array[String], mh: Array[Long])

  /** Scala-side mirrors of [[shingles]] and [[Portable.portable32]] —
    * byte-identical values (first 8 hex chars of lowercase md5 of the
    * UTF-8 text, parsed base-16). */
  def shinglesOf(text: String): Array[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Array(text)
    else Array.tabulate(w.length - 2)(i => w(i) + " " + w(i + 1) + " " + w(i + 2))
  }

  def portable32Of(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 bytes of the digest == first 8 hex chars, as unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Per-partition signature kernel (mapPartitions — the documented
    * last-resort tier, and the right one here: Catalyst higher-order
    * lambdas run interpreted with no codegen and no common-subexpression
    * elimination, so the md5 subtree re-evaluates once per referencing
    * column and CollapseProject/CollapseRepartition defeat every pure
    * plan-level barrier — measured 4.4–56s at sf0.1 for what this kernel
    * does in <1s. Values are identical to the Column-expression form and
    * the DuckDB oracle recomputes them in SQL. */
  def signatures(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[DocSig] =
    signaturesOn(Tables.documents(spark, dir))

  /** [[signatures]] over an arbitrary corpus frame (needs doc_id, text)
    * — the incremental-curation path signs DELTA documents only. */
  def signaturesOn(docs: DataFrame): org.apache.spark.sql.Dataset[DocSig] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = spark.sparkContext.defaultParallelism
    docs
      .select(col("doc_id"), col("text"))
      .repartition(n) // one small file = one input split otherwise
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val sh = shinglesOf(text)
          val hs = sh.map(portable32Of(md, _))
          val mh = Array.tabulate(MinhashSeeds) { i =>
            var m = Long.MaxValue
            var j = 0
            while (j < hs.length) {
              val v = (hs(j) * MinhashA(i) + MinhashB(i)) % MinhashP
              if (v < m) m = v
              j += 1
            }
            m
          }
          DocSig(id, sh.distinct, mh)
        }
      }
  }

  /** MinHash signatures (8 hashes) per document; the oracle recomputes
    * the identical signature in SQL. */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame = {
    val mhCols = (0 until MinhashSeeds).map(i =>
      element_at(col("mh"), i + 1).as(f"mh$i"))
    signatures(spark, dir).toDF()
      .select(col("doc_id") +: mhCols: _*)
      .orderBy("doc_id")
  }

  /** MinHash + LSH near-duplicate pairs: 4 bands × 2 rows; candidate
    * pairs share at least one full band, then pay an exact shingle-set
    * Jaccard check at `threshold`.
    *
    * Single-pass shape: signature, band keys and the (distinct) shingle
    * set come out of one kernel pass, shuffle once on the band key, and
    * pairs are generated *inside* each bucket with their Jaccard.
    * Bucket sizes are near-dup cluster sizes — small by construction;
    * the shuffle carries nBands copies of the shingle arrays, the
    * standard LSH space/time trade. */
  /** LSH band keys (doc_id, band, h1, h2) from a signature frame
    * (doc_id, mh): 4 bands × 2 rows — scan-local explode, no shuffle. */
  private[operators] def bandsOf(sig: DataFrame): DataFrame = {
    val bands = (0 until MinhashSeeds / 2).map(b =>
      struct(lit(b).as("band"),
        element_at(col("mh"), 2 * b + 1).as("h1"),
        element_at(col("mh"), 2 * b + 2).as("h2")))
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.h1").as("h1"), col("bk.h2").as("h2"))
  }

  /** Exact shingle-set Jaccard for candidate pairs, in the typed kernel
    * tier: cand (ida, idb) joined to its endpoints' distinct shingle
    * sets (doc_id, shs) — only candidates pay the set intersection. */
  private[operators] def exactJaccard(cand: DataFrame,
      sets: DataFrame): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand
      .join(sets.select(col("doc_id").as("ida"), col("shs").as("sha")), "ida")
      .join(sets.select(col("doc_id").as("idb"), col("shs").as("shb")), "idb")
      .select(col("ida"), col("idb"), col("sha"), col("shb"))
      .as[(Long, Long, Array[String], Array[String])]
      .mapPartitions(_.map { case (a, b, sa, sb) =>
        val setA = sa.toSet
        val inter = sb.count(setA.contains)
        val union = sa.length + sb.length - inter
        (a, b, inter.toDouble / union)
      })
      .toDF("ida", "idb", "jaccard")
  }

  def minhashNearDups(spark: SparkSession, dir: String,
      threshold: Double = NearDupJaccard,
      maxBucket: Long = VectorOps.DefaultMaxBucket): DataFrame =
    minhashNearDupsOn(Tables.documents(spark, dir), threshold, maxBucket)

  /** [[minhashNearDups]] over an arbitrary corpus frame. */
  def minhashNearDupsOn(docs: DataFrame,
      threshold: Double = NearDupJaccard,
      maxBucket: Long = VectorOps.DefaultMaxBucket): DataFrame =
    minhashCandidatePairsOn(docs, maxBucket)
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"),
        graft.util.Portable.val6(col("jaccard")).as("jaccard"))
      .orderBy("ida", "idb")

  /** The banded candidate pairs with their RAW exact Jaccard, before
    * any threshold — the sweep input for [[dedupProfile]] and the
    * filter input for [[minhashNearDupsOn]]. */
  private[operators] def minhashCandidatePairsOn(docs: DataFrame,
      maxBucket: Long = VectorOps.DefaultMaxBucket): DataFrame = {
    // ONE signature kernel pass (r11): the plan references the
    // signature frame up to 6× (bucket census + capped join + both
    // self-join sides + both exact-verify sides), and the per-consumer
    // re-evaluation this replaces ran the shingling + 8-seed MinHash
    // kernel once per reference — aliased projections defeat exchange
    // reuse exactly as in q204's deg subtree (guide §2.4: don't compute
    // things twice). The localCheckpoint materializes (doc_id, shs, mh)
    // once; candidate generation still SHUFFLES only the (doc_id, band,
    // h1, h2) longs (the wide shs column is pruned below every
    // exchange), and the verify side reads the same blocks. Scale: the
    // materialized volume is the corpus shingle set — the same payload
    // the verify joins already move — and the same discipline as
    // PrefixJoin's docs checkpoint.
    val sig = signaturesOn(docs).toDF().localCheckpoint()
    def banded = bandsOf(sig)
    // skew guard (VectorOps.withBucketCap): a pathological corpus where
    // every document shares one band signature would make one bucket ≈
    // the corpus and the band join quadratic; sub-splitting bounds pair
    // work to n·cap. Inert (sub = 0 everywhere) at every gate SF.
    val capped = VectorOps.withBucketCap(banded,
      Seq("band", "h1", "h2"), "doc_id", maxBucket,
      broadcastCensus = false)
    val l = capped.select(col("doc_id").as("ida"), col("band"),
      col("h1"), col("h2"), col("_sub").as("suba"))
    val r = capped.select(col("doc_id").as("idb"), col("band").as("bandr"),
      col("h1").as("h1r"), col("h2").as("h2r"), col("_sub").as("subb"))
    val cand = l.join(r, col("band") === col("bandr")
        && col("h1") === col("h1r") && col("h2") === col("h2r")
        && col("suba") === col("subb")
        && col("ida") < col("idb"))
      .select("ida", "idb").distinct()

    // exact Jaccard only for candidates, in a typed kernel — reading
    // the one checkpointed signature frame, not a fresh kernel pass
    exactJaccard(cand, sig.select(col("doc_id"), col("shs")))
  }

  /** q192: corpus redundancy profile — the near-dup statistics swept
    * across similarity thresholds (0.5 / 0.7 / 0.9): pair count,
    * documents with at least one partner, and the dup rate at each
    * cut. The chart a curation owner reads BEFORE committing to a
    * dedup threshold: how much of the corpus each policy would touch.
    * Candidates come from the SAME banded MinHash join as q33 (one
    * candidate pass, never all-pairs); the sweep is three filters
    * over the already-tiny verified pair set, so the marginal cost
    * of extra thresholds is ~zero at any corpus size. */
  def dedupProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cp = minhashCandidatePairsOn(Tables.documents(spark, dir))
      .select(col("ida"), col("idb"), col("jaccard"))
    val thr = Seq(0.5, 0.7, 0.9).toDF("threshold")
    val e = cp.withColumn("threshold",
        explode(array(lit(0.5), lit(0.7), lit(0.9))))
      .filter(col("jaccard") >= col("threshold"))
    val np = e.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val ids = e.select(col("threshold"), col("ida").as("id"))
      .union(e.select(col("threshold"), col("idb").as("id")))
    val ndup = ids.distinct().groupBy("threshold")
      .agg(count(lit(1)).as("n_dup_docs"))
    val n = Tables.documents(spark, dir).count()
    thr.join(np, Seq("threshold"), "left")
      .join(ndup, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        (coalesce(col("n_dup_docs"), lit(0L)).cast("double") /
          lit(n.toDouble)).as("dup_rate"))
      .orderBy("threshold")
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

  /** 32-bit SimHash per document via the same typed kernel tier as
    * [[signatures]] (32 bit-majority columns through interpreted
    * higher-order lambdas would re-evaluate the md5 transform per
    * column): bit b is set when at least half the token hashes have
    * bit b set. Map-only, no shuffle beyond the scan fan-out. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashUnsorted(spark, dir).orderBy("doc_id")

  private[operators] def simhashUnsorted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = spark.sparkContext.defaultParallelism
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(n)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val hs = text.split(" ", -1).map(portable32Of(md, _))
          var sim = 0L
          var b = 0
          while (b < SimhashBits) {
            var cnt = 0
            var j = 0
            while (j < hs.length) {
              if (((hs(j) >> b) & 1L) == 1L) cnt += 1
              j += 1
            }
            if (2 * cnt >= hs.length) sim |= (1L << b)
            b += 1
          }
          (id, sim)
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** TF-IDF scoring — the inverted-index build every retrieval /
    * data-curation pipeline runs over its corpus. Three aggregations:
    * term frequency per (doc, term) (shuffle on the compound key with
    * map-side combine), document frequency per term (a second reduce over
    * the already-distinct tf pairs), and the corpus size N. The df
    * vocabulary and the 1-row N are broadcast back onto tf, so the big
    * (doc,term) side never shuffles again; top-k per doc runs as one
    * window over the doc partition.
    *
    * Determinism: idf = ln(N/df) is transcendental, so ranking directly
    * by the double invites cross-engine 1-ulp order flips on
    * mathematically-equal scores (e.g. 2·ln5 ≡ ln25). The rank key is
    * therefore the FLOOR-SCALED integer score (micro-units) with the term
    * as tiebreak — bit-stable in both engines; the reported tfidf is that
    * integer divided back out. Scoring is restricted to a doc shard
    * (doc_id < 100) to bound the gate's result size; df/N statistics are
    * corpus-wide, as they must be. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.filter(col("doc_id") < 100)
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_i",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf_i"), asc("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        (col("tfidf_i").cast("double") / 1000000.0).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Pairwise document cosine similarity through an INVERTED INDEX —
    * the scalable sparse-vector form of all-pairs similarity: instead
    * of a doc×doc cross join, the term-frequency table self-joins on
    * the TERM (docs sharing no term never meet), partial products sum
    * per pair, and norms join in at the end. At corpus scale this is
    * the standard shape (plus a df-cutoff dropping ubiquitous terms,
    * which would otherwise dominate the fan-out; the shard here bounds
    * the gate's output instead).
    *
    * Determinism: tf vectors are integers, so dot products and squared
    * norms are exact; cosine = dot / (sqrt(qa)·sqrt(qb)) is three
    * correctly-rounded IEEE ops on exact inputs — bit-identical in any
    * engine — and the emitted value is floor-scaled to 6dp. The pair
    * filter is on the INTEGER dot product, never on the float. */
  def cosineTfPairs(spark: SparkSession, dir: String, shard: Long = 60,
      minDot: Long = 3): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .filter(col("doc_id") < shard)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("q"))
    val a = tf.select(col("doc_id").as("ida"), col("term"),
      col("tf").as("tfa"))
    val b = tf.select(col("doc_id").as("idb"), col("term"),
      col("tf").as("tfb"))
    a.join(b, Seq("term"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb")
      .agg(sum(col("tfa") * col("tfb")).as("dot"))
      .filter(col("dot") >= minDot)
      .join(broadcast(norms.select(col("doc_id").as("ida"),
        col("q").as("qa"))), "ida")
      .join(broadcast(norms.select(col("doc_id").as("idb"),
        col("q").as("qb"))), "idb")
      .select(col("ida"), col("idb"), col("dot"),
        Portable.val6(col("dot") /
          (sqrt(col("qa").cast("double")) * sqrt(col("qb").cast("double"))))
          .as("cos_sim"))
      .orderBy("ida", "idb")
  }

  /** Fixed-width histogram of document lengths — the distribution
    * profile every corpus-curation pass starts with. Bucketing is a
    * scan-local integer floor-divide; the aggregate is an ordinary
    * map-side-combined groupBy over ≤ (max/width) buckets. */
  def docLengthHistogram(spark: SparkSession, dir: String, width: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .groupBy((floor(col("n_chars") / width) * width).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bucket_lo")

  /** Fixed-size overlapping token chunking (SURVEY §8.10 — the
    * context-window prep step of every LLM training/RAG pipeline:
    * long documents become size-N token windows advancing by a
    * stride, trailing overlap preserving cross-chunk context). The
    * offsets GENERATE scan-locally (`sequence(0, n-1, stride)` +
    * explode — rows fan out in place, no shuffle, no driver loop) and
    * `slice` re-materializes each window from the one tokenized array,
    * so cost is O(chunks) per doc and the operator is embarrassingly
    * parallel at any corpus size. */
  def chunkDocs(spark: SparkSession, dir: String,
      chunkSize: Int = 50, stride: Int = 40): DataFrame = {
    val ws = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0),
          greatest(size(col("ws")) - 1, lit(0)), lit(stride))).as("off"))
      .select(col("doc_id"),
        (col("off") / stride).cast("long").as("chunk_idx"),
        least(lit(chunkSize), size(col("ws")) - col("off"))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("ws"), col("off") + 1, lit(chunkSize)))
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Top bigrams (collocations) per language (SURVEY §8.10 corpus
    * profiling): adjacent-token pairs generated scan-locally (the
    * shingle machinery at n=2), counted with a map-side-combined
    * groupBy at (lang, bigram) grain, then per-language top-5 via the
    * row_number pattern (TopKPerKey under extensions). Pure integer
    * counts — no portability scaffolding. */
  def topBigrams(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = tokens(col("text"))
    val bigrams = Tables.documents(spark, dir)
      .select(col("lang"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"), explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2)))).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
    val rw = Window.partitionBy("lang").orderBy(desc("n"), asc("bigram"))
    bigrams.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("bigram"), col("n"))
      .orderBy("lang", "rank")
  }

  /** Stratified deterministic sampling: per-language keep rates via a
    * portable hash of the key — `sampleBy` semantics without RNG state,
    * reproducible across engines, runs, and cluster layouts (same
    * rationale as Relational.hashSample, which this generalizes to
    * per-stratum rates). Scan-local filter; no shuffle. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate20 = when(col("lang") === "en", 1)
      .when(col("lang") === "es", 2)
      .when(col("lang") === "de", 4)
      .otherwise(1)
    Tables.documents(spark, dir)
      .filter(Portable.portable32(col("doc_id").cast("string")) % 20 < rate20)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** SimHash near-duplicate pairs at Hamming distance ≤ `maxHamming`,
    * found by byte-banding: a pair differing in ≤3 of 32 bits must agree
    * on at least one of the 4 bytes (pigeonhole), so bucketing on
    * (band, byte) has GUARANTEED recall — the oracle checks this against
    * a literal all-pairs `bit_count(xor(...))` scan. The Hamming filter
    * is the custom codegen'd Catalyst expression
    * [[graft.functions.HammingDistance]].
    *
    * Candidates come from a band-key SELF-JOIN, not in-bucket array
    * pairing: similar corpora make SimHash bytes cluster, and a k-sized
    * bucket would materialize a k² array in one row (measured 197s at
    * sf0.1); the join streams the same pairs through the codegen'd
    * hamming filter (12s → ~2s). The signature input is the cheap typed
    * kernel, so evaluating it on both join sides costs little. */
  def simhashNearDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    import graft.functions.HammingDistance.hamming
    def banded = {
      val bands = (0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(0xffL)).as("byte")))
      simhashUnsorted(spark, dir)
        .select(col("doc_id"), col("simhash"),
          explode(array(bands: _*)).as("bk"))
    }
    val l = banded.select(col("doc_id").as("ida"), col("simhash").as("sa"),
      col("bk").as("bka"))
    val r = banded.select(col("doc_id").as("idb"), col("simhash").as("sb"),
      col("bk").as("bkb"))
    l.join(r, col("bka") === col("bkb") && col("ida") < col("idb"))
      .select(col("ida"), col("idb"), hamming(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("ida", "idb").agg(first(col("hamming")).as("hamming"))
      .orderBy("ida", "idb")
  }

  /** Per-language token Shannon entropy — the vocabulary-diversity
    * signal corpus-quality scoring uses next to q28's per-doc ratios
    * (low entropy ⇒ templated/boilerplate text). Identity used:
    * H = ln(N) − (Σ c·ln c)/N over per-language token counts c, so the
    * float work is ONE ln per distinct (lang, token) — not per token —
    * and the cross-row float sum that would be order-dependent is
    * replaced by an exact BIGINT sum of floor-scaled terms
    * (Portable.scala discipline; same trick as q63's tf·idf). Two
    * shuffles, both map-side combinable: tokens→(lang,token) counts,
    * counts→per-lang moments. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
    val cD = col("c").cast("double")
    counts
      .groupBy("lang")
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(floor(cD * log(cD) * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("s_clnc"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        Portable.val6(log(col("n_tokens").cast("double")) -
          (col("s_clnc").cast("double") / lit(1000000.0)) /
            col("n_tokens").cast("double")).as("entropy_nats"))
      .orderBy("lang")
  }

  /** Higher-order-function sweep over tokenized documents (SURVEY §8.10
    * extensions; the array-lambda family q28/q29 use in anger, isolated
    * as a surface test): `filter`, `transform`, `aggregate` (fold),
    * `exists`, `forall`, plus array_max over a transform. All lambdas
    * run scan-local inside whole-stage codegen — zero shuffles before
    * the output sort. */
  def hofSweep(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 150)
      .select(
        col("doc_id"),
        size(filter(ws, t => length(t) > 5)).cast("long").as("n_long_tokens"),
        array_join(transform(slice(ws, 1, 3), t => upper(t)), "_")
          .as("head3_upper"),
        aggregate(ws, lit(0L), (acc, t) => acc + length(t))
          .as("total_token_chars"),
        exists(ws, t => t === "the").as("has_the"),
        forall(ws, t => length(t) > 0).as("all_nonempty"),
        array_max(transform(ws, t => length(t))).cast("long")
          .as("longest_token"))
      .orderBy("doc_id")
  }

  /** Sequence packing for LLM training: assign documents to fixed
    * token-budget packs (context windows) by cumulative token count —
    * the batch-assembly step between dedup/quality filtering and
    * tokenizer output in every pretraining pipeline. Packing is per
    * `source` shard (PARTITION BY source, the realistic unit: packs
    * never span shards), so the running sum is an ordinary partitioned
    * window — no global sort, scales with shard count. A document
    * lands in pack `floor(tokens_before / budget)`: deterministic,
    * one-pass, and a pack overflows the budget by at most one document
    * (the standard streaming-packing trade; exact bin packing is
    * NP-hard and order-destroying). */
  def packDocuments(spark: SparkSession, dir: String,
      budget: Int = 256): DataFrame =
    packDocumentsOn(Tables.documents(spark, dir), budget)

  /** [[packDocuments]] over an arbitrary corpus frame (needs doc_id,
    * text, and every `shardCols` column) — the form
    * [[graft.TrainingPipeline]] runs on the curated subset. Packs are
    * scoped to `shardCols`: a pack NEVER spans a shard-column boundary,
    * which is what lets a trainer worker read one shard directory and
    * see only complete packs. */
  def packDocumentsOn(docs: DataFrame, budget: Int,
      shardCols: Seq[String] = Seq("source")): DataFrame = {
    val keys = shardCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(keys :+ col("doc_id")
        :+ size(split(col("text"), " ")).cast("long").as("n_tokens"): _*)
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tokens_before DIV $budget"))
      .select(shardCols ++
        Seq("doc_id", "n_tokens", "tokens_before", "pack_id") map col: _*)
      .orderBy(shardCols :+ "doc_id" map col: _*)
  }

  /** Pack-level summary over [[packDocuments]] — the mart a training
    * pipeline actually reads: docs per pack, token fill, and exact
    * integer-permille utilization of the budget (floor-scaled so the
    * ratio is engine-portable). One extra keyed agg over the pack
    * assignment; grain = packs, bounded by corpus_tokens/budget. */
  def packStats(spark: SparkSession, dir: String,
      budget: Int = 256): DataFrame =
    packDocuments(spark, dir, budget)
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"))
      .withColumn("util_permille",
        expr(s"tokens_total * 1000 DIV $budget"))
      .orderBy("source", "pack_id")

  /** PII redaction over a text column — the scrub pass a training-data
    * pipeline runs before anything leaves the raw zone. The fixture
    * text is assembled from customer fields so it deterministically
    * CONTAINS one phone (TPC-H `nn-nnn-nnn-nnnn`) and one synthetic
    * email per row; both patterns redact to placeholder tags via
    * codegen'd regexp_replace (scan-local, no shuffle before the output
    * sort), with per-pattern hit flags for the audit counters. The
    * regexes stay in the Java∩RE2 common dialect so the DuckDB oracle
    * applies the identical patterns. */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    // deterministic TPC-H-style phone from the key (the testdata
    // customer table ships no phone column): each component's range
    // guarantees its digit width, so plain concat needs no padding
    val k = col("c_custkey")
    val phone = concat_ws("-",
      (k % 90 + 10).cast("string"), (k % 900 + 100).cast("string"),
      ((k * 7) % 900 + 100).cast("string"),
      ((k * 13) % 9000 + 1000).cast("string"))
    val raw = concat(col("c_name"), lit(" <user"),
      col("c_custkey").cast("string"), lit("@example.com> phone "),
      phone, lit(" segment: "), col("c_mktsegment"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), raw.as("raw"))
      .select(
        col("c_custkey"),
        regexp_replace(regexp_replace(col("raw"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("redacted"),
        col("raw").rlike(phoneRe).as("had_phone"),
        col("raw").rlike(emailRe).as("had_email"))
      .orderBy("c_custkey")
  }

  // ---- corpus hygiene: decontamination / repetition / shuffle-shard -----

  /** Token n-grams per document as (doc_id, gram) rows — one per
    * OCCURRENCE (callers dedup where set semantics apply); documents
    * shorter than n emit nothing. Pure higher-order-function math over
    * the token array: map-side explode, stays in codegen, no shuffle. */
  private def docGrams(df: DataFrame, n: Int): DataFrame =
    df.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $n), " +
          s"i -> array_join(slice(w, i + 1, $n), ' '))")).as("gram"))

  /** Benchmark decontamination — the filter every training corpus runs
    * before anything ships to a trainer: does a training document
    * contain an n-gram that also appears in the held-out eval set?
    * The eval membership is derived deterministically here
    * (doc_id % evalMod == 0 stands in for "the benchmark suite") so the
    * oracle replays it; in production the eval side is a fixed file.
    *
    * Shape: distinct eval grams are benchmark-suite-sized — MBs by
    * construction, never corpus-sized — so the probe is an explicitly
    * broadcast hash join against the train grams (provably small side:
    * the one case where a hint beats AQE, because the relation is small
    * by CONTRACT, not by sampled estimate). Train-side gram explosion
    * is map-local; the only shuffles are the per-doc distinct and the
    * hit count, both keyed on doc_id — at 100 TB this is one scan plus
    * one doc-keyed aggregation. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 4,
      evalMod: Int = EvalMod): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val isEval = col("doc_id") % evalMod === 0
    decontaminateOn(d.filter(!isEval), d.filter(isEval), n)
  }

  /** [[decontaminate]] with explicit train/eval corpora — the eval side
    * is the external benchmark registry (small by contract, broadcast);
    * the incremental path probes DELTA train docs only against it. */
  def decontaminateOn(trainDocs: DataFrame, evalDocs: DataFrame,
      n: Int = 4): DataFrame = {
    val evalGrams = docGrams(evalDocs.select(col("doc_id"), col("text")), n)
      .select("gram").distinct()
    val trainGrams =
      docGrams(trainDocs.select(col("doc_id"), col("text")), n).distinct()
    val hits = trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("contaminated_grams"))
    trainDocs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated_grams"), lit(0L)).as("contaminated_grams"))
      .withColumn("is_contaminated", col("contaminated_grams") > 0)
      .orderBy("doc_id")
  }

  /** Gopher-style repetition quality signals per document: duplicate
    * trigram fraction (1 - distinct/total) and the fraction of bigram
    * occurrences taken by the single most frequent bigram — the two
    * cheap boilerplate detectors a corpus filter runs before any model
    * scoring. Ratios are floor-scaled 6-decimal doubles
    * ([[Portable.val6]]) so the oracle hash matches bit-for-bit.
    *
    * Shape: gram explode is map-local; both signal trees are one
    * doc-keyed aggregation each (partial aggs apply), joined back on
    * doc_id. Documents too short for a gram get 0.0 fractions and keep
    * = true. At 100 TB this is a scan plus two doc-keyed shuffles —
    * no global state anywhere. */
  def repetitionStats(spark: SparkSession, dir: String,
      dupTriMax: Double = 0.2, topBiMax: Double = 0.2): DataFrame =
    repetitionStatsOn(Tables.documents(spark, dir), dupTriMax, topBiMax)

  /** [[repetitionStats]] over an arbitrary corpus frame. */
  def repetitionStatsOn(docs: DataFrame,
      dupTriMax: Double = 0.2, topBiMax: Double = 0.2): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val tri = docGrams(d, 3).groupBy("doc_id")
      .agg(count(lit(1)).as("tri_total"),
        countDistinct(col("gram")).as("tri_distinct"))
    val bi = docGrams(d, 2).groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("bi_total"), max("cnt").as("top_bi_cnt"))
    def frac(num: Column, den: Column): Column =
      when(den > 0, Portable.val6(num.cast("double") / den))
        .otherwise(lit(0.0))
    d.select("doc_id")
      .join(tri, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tri_total"), lit(0L)).as("tri_total"),
        coalesce(col("tri_distinct"), lit(0L)).as("tri_distinct"),
        frac(coalesce(col("tri_total"), lit(0L))
          - coalesce(col("tri_distinct"), lit(0L)),
          coalesce(col("tri_total"), lit(0L))).as("dup_tri_frac"),
        frac(coalesce(col("top_bi_cnt"), lit(0L)),
          coalesce(col("bi_total"), lit(0L))).as("top_bi_frac"))
      .withColumn("keep",
        col("dup_tri_frac") <= dupTriMax && col("top_bi_frac") <= topBiMax)
      .orderBy("doc_id")
  }

  /** Deterministic global shuffle + round-robin sharding — the step
    * that turns a curated corpus into training input: every document
    * gets a pseudo-random but REPRODUCIBLE position (order by
    * md5(seed‖doc_id)), then shard = position % nShards and pos =
    * position DIV nShards, which balances shards to within one row by
    * construction. Uses [[Relational.denseGlobalRank]] — the two-phase
    * range-partition rank — so there is no single-partition global
    * sort at any scale; the hash ordering is uniform, so the range
    * partitions are balanced too. */
  def shuffleShard(spark: SparkSession, dir: String,
      nShards: Int = 8): DataFrame =
    shuffleShardOn(Tables.documents(spark, dir), nShards)

  /** [[shuffleShard]] over an arbitrary corpus frame (needs doc_id). */
  def shuffleShardOn(docs: DataFrame, nShards: Int): DataFrame = {
    val d = docs
      .select(col("doc_id"),
        md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("skey"))
    Relational.denseGlobalRank(d, "skey", "rk", base = 0L)
      .select(col("doc_id"),
        ((col("rk") - 1) % nShards).as("shard"),
        expr(s"(rk - 1) DIV $nShards").as("pos"))
      .orderBy("doc_id")
  }

  /** The whole curation chain as one verdict table — the end-to-end
    * composition a corpus team actually ships: per training document,
    * one boolean per stage (language target, lexical quality,
    * repetition, benchmark decontamination, near-dup canonicality) and
    * the conjunction. Every stage is an already-gated operator
    * ([[langId]], [[qualityScore]], [[repetitionStats]],
    * [[decontaminate]], [[Graphs.dedupClusters]]) joined back on
    * doc_id, so the composed plan is a DAG of doc-keyed hash joins over
    * stages that each scale independently; nothing here adds a shuffle
    * beyond the stages' own. Eval documents (the decontamination
    * reference set) are excluded from the corpus — they are benchmarks,
    * not training data. A near-dup whose cluster canonical is an eval
    * doc is dropped by the dedup verdict, which is exactly right: it IS
    * benchmark material. */
  def curationVerdicts(spark: SparkSession, dir: String): DataFrame =
    curationVerdictsUnordered(spark, dir).orderBy("doc_id")

  /** [[curationVerdicts]] without the output sort — the form every
    * COMPOSITION consumes (q146's aggregate, q154's layer write):
    * the doc_id order is q145's OUTPUT contract, not part of the
    * verdict semantics, and a sorted write/checkpoint pays a range
    * exchange + sort the consumer immediately discards (r11). */
  private[graft] def curationVerdictsUnordered(spark: SparkSession,
      dir: String): DataFrame =
    curationVerdictsWithDed(spark, dir,
      // the auto-closure variant (identical output): inside a
      // composition the closure is a stage, not the gated algorithm
      Graphs.dedupClustersAuto(spark, dir)
        .select(col("doc_id"), col("is_canonical").as("dedup_ok")))

  /** [[curationVerdicts]] with the dedup verdict precomputed — lets
    * q200 share one pair closure across verdicts and splits. */
  private[graft] def curationVerdictsWithDed(spark: SparkSession,
      dir: String, ded: DataFrame): DataFrame = {
    // target-language selection reads the lang METADATA column — in
    // production that column is written by the upstream language-ID
    // pass ([[langId]], gated standalone as q29); on this fixture the
    // text is label-independent, so the metadata column is the only
    // signal with real selectivity
    val lang = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").as("lang_ok"))
    val qual = qualityScore(spark, dir)
      .select(col("doc_id"),
        (col("type_token_ratio") >= 0.35 && col("n_tokens") >= 20)
          .as("quality_ok"))
    val rep = repetitionStats(spark, dir)
      .select(col("doc_id"), col("keep").as("rep_ok"))
    val dec = decontaminate(spark, dir)
      .select(col("doc_id"), (!col("is_contaminated")).as("decon_ok"))
    dec // decontaminate is already train-only (eval docs excluded)
      .join(lang, "doc_id").join(qual, "doc_id")
      .join(rep, "doc_id").join(ded, "doc_id")
      .select(col("doc_id"), col("lang_ok"), col("quality_ok"),
        col("rep_ok"), col("decon_ok"), col("dedup_ok"))
      .withColumn("keep", col("lang_ok") && col("quality_ok")
        && col("rep_ok") && col("decon_ok") && col("dedup_ok"))
    // no output sort here: callers that publish the q145 contract add
    // orderBy("doc_id") themselves; compositions (q146/q154/q200)
    // aggregate, write, or checkpoint this frame and a sort would be
    // pure discarded work (r11)
  }

  /** Deterministic language-balanced resampling — the mixture-weighting
    * step a multilingual training corpus runs before sharding: the
    * over-represented language is downsampled so every language
    * contributes (up to hash granularity) the size of the SMALLEST one.
    * Per-language keep rate = min_count/count, applied as pure integer
    * math on a portable hash: keep iff
    * `portable32("mix:" ‖ doc_id) % 1e6 < (min_count * 1e6) DIV count`
    * — reproducible across engines and runs, no RNG. The minimum count
    * is a driver scalar (one long — metadata-sized, the documented
    * Scd2-maxSk pattern); rates broadcast to a scan-local verdict.
    * Statistical property (not exact): each language keeps
    * ≈ rate × count docs, binomial-concentrated; the spec asserts a
    * 5σ envelope. */
  def langMixture(spark: SparkSession, dir: String): DataFrame =
    langMixtureOn(spark, Tables.documents(spark, dir))

  /** [[langMixture]] over an arbitrary corpus frame (needs doc_id,
    * lang) — rates derive from THAT frame's language distribution. */
  def langMixtureOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val d = docs.select(col("doc_id"), col("lang"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val minCnt: Long = counts.agg(min("cnt")).as[Long].head()
    val rates = counts.withColumn("mix_threshold",
      // L-suffixed literals: bare INT literals would multiply in 32-bit
      // and wrap past min_count > 2147 (the oracle's math is 64-bit)
      expr(s"${minCnt}L * 1000000L DIV cnt"))
    d.join(broadcast(rates), Seq("lang"))
      .withColumn("hash_bucket",
        Portable.portable32(concat(lit("mix:"), col("doc_id").cast("string")))
          % lit(1000000L))
      .withColumn("keep", col("hash_bucket") < col("mix_threshold"))
      .select("doc_id", "lang", "cnt", "mix_threshold", "hash_bucket", "keep")
      .orderBy("doc_id")
  }

  /** Corpus snapshot diff — the day-2 operation of a living corpus:
    * classify every document across two snapshot versions as added /
    * removed / changed / unchanged by comparing content fingerprints
    * under a FULL OUTER join on doc_id. The two versions are derived
    * deterministically here (v1 drops doc_id % 7 == 0 and carries an
    * edited text for doc_id % 11 == 0; v2 drops doc_id % 5 == 0), so
    * the oracle rebuilds the identical diff; in production both sides
    * are snapshot tables. One key-shuffled join, fingerprints computed
    * scan-local — the shape of a 100 TB snapshot reconciliation. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v1 = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        contentFp(when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" [edited]"))).otherwise(col("text")))
          .as("fp1"))
    val v2 = d.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), contentFp(col("text")).as("fp2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")
  }

  /** Quality-aware canonical selection (q159) — the dedup RETENTION
    * POLICY a real corpus ships: within a near-dup cluster keep the
    * HIGHEST-QUALITY copy (most tokens; doc_id breaks ties), not the
    * lowest id. min-id canonicality (q65) answers "which cluster";
    * this answers "which copy survives" — re-crawls and cleaned
    * variants of the same page differ in exactly this way.
    *
    * Shape: the same LSH pairs + closure as q65, one doc-keyed join to
    * attach the quality key, then ONE keyed window per component
    * (components are tiny by construction) — no new global state. */
  def qualityCanonical(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashNearDups(spark, dir).select("ida", "idb")
    // componentsAuto: identical closure, driver-closed below its edge
    // bound (near-dup pair lists are cluster-sized), distributed above
    val comp = Graphs.componentsAuto(pairs, "ida", "idb")
      .withColumnRenamed("id", "doc_id")
    val qual = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    qual
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("comp"), col("doc_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical",
        row_number().over(Window.partitionBy("component")
          .orderBy(col("n_tokens").desc, col("doc_id").asc)) === 1)
      .select("doc_id", "component", "cluster_size", "n_tokens",
        "is_canonical")
      .orderBy("doc_id")
  }

  /** Vocabulary coverage mart (q160) — the tokenizer-design question:
    * how much of the corpus do the top-k token types cover? Token
    * counts at vocabulary grain, globally ranked by (count DESC, token)
    * and cumulatively summed — BOTH through the two-phase
    * [[Relational.globalRankedPrefixSum]], so there is no
    * single-partition ORDER BY anywhere: the order key encodes
    * count-descending as a fixed-width decimal prefix, making the
    * range partitioning the sort. Coverage ratios floor-scale through
    * [[Portable.val6]] for the oracle hash. */
  def vocabCoverage(spark: SparkSession, dir: String,
      topK: Int = 200): DataFrame = {
    import spark.implicits._
    // materialized once: the grand total and the ranked pass both read
    // the vocabulary-grain counts — without this the explode + groupBy
    // over the documents scan executes twice
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total: Long = counts.agg(sum("cnt")).as[Long].head()
    // (count DESC, token ASC) as ONE lexicographic key: 19-digit
    // zero-padded (1e18 - cnt) prefix, binary-collated token suffix.
    // 1e18 (not 1e12): a single token type in a 100 TB corpus can pass
    // 1e12 occurrences, and a negative difference would break the
    // lexicographic = numeric-descending equivalence
    val keyed = counts.withColumn("_k",
      concat(
        lpad((lit(1000000000000000000L) - col("cnt")).cast("string"), 19, "0"),
        col("token")))
    Relational.globalRankedPrefixSum(keyed, "_k", "cnt", "rank", "cum_tokens")
      .filter(col("rank") <= topK)
      .select(col("token"), col("cnt"), col("rank"), col("cum_tokens"),
        Portable.val6(col("cum_tokens").cast("double") / lit(total.toDouble))
          .as("coverage"))
      .orderBy("rank")
  }

  /** Stage-by-stage survival counts over [[curationVerdicts]] — the
    * funnel mart the curation dashboard reads. One aggregation pass
    * (six conditional sums), then a stack to rows; grain = stages. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val v = curationVerdictsUnordered(spark, dir)
    def surv(c: Column) = sum(c.cast("long"))
    val l = col("lang_ok"); val q = col("quality_ok"); val r = col("rep_ok")
    val d = col("decon_ok"); val dd = col("dedup_ok")
    v.agg(
        count(lit(1)).as("s0"), surv(l).as("s1"), surv(l && q).as("s2"),
        surv(l && q && r).as("s3"), surv(l && q && r && d).as("s4"),
        surv(l && q && r && d && dd).as("s5"))
      .select(expr("stack(6, " +
        "0, 'ingest', s0, 1, 'lang', s1, 2, 'quality', s2, " +
        "3, 'repetition', s3, 4, 'decontamination', s4, 5, 'dedup', s5" +
        ") AS (stage_no, stage, survivors)"))
      .orderBy("stage_no")
  }

  /** q172: mixture sampling to a TOKEN budget — the unit a training
    * run actually provisions. Per language, documents are ordered by a
    * deterministic hash (the q48/q64 sampling discipline, so the
    * sample is reproducible and unbiased by ingest order) and taken
    * while the running token total is still under the language's
    * budget (here ⌊2/5 of its corpus tokens⌋ — the mixture knob); the
    * document that crosses the boundary is kept, matching the
    * "fill the budget" contract. One pass: token counts are scan-local,
    * the budget is one tiny per-lang aggregate broadcast back, and the
    * cumulative sum is a per-lang window (languages parallelize; within
    * one giant language the two-phase [[graft.operators.Relational]]
    * `globalRankedPrefixSum` is the drop-in scale path — same rule,
    * no single-partition sort). */
  def tokenBudgetSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      Portable.portable32(col("doc_id").cast("string")).as("h"))
    val budgets = d.groupBy("lang")
      .agg(expr("(sum(n_tokens) * 2) div 5").as("budget"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum_tokens", sum("n_tokens").over(w))
      .join(broadcast(budgets), "lang")
      .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  /** q178: unigram language-model scoring — the perplexity-style
    * quality filter (the KenLM stage of a real curation pipeline, at
    * unigram order so the model itself is a corpus aggregate and the
    * whole stage stays oracle-able): the corpus unigram distribution is
    * estimated with add-one smoothing over the observed vocabulary,
    * and each document scores its average negative log-likelihood in
    * nats/token — out-of-distribution docs (rare-token soup) score
    * high and get cut.
    *
    * Determinism: each token's ln p floor-scales to BIGINT nano-units
    * BEFORE the per-doc sum (exact integer reduction under any
    * partial-agg order); the model probabilities are exact rationals
    * evaluated in one IEEE division each. Scale: the model is one
    * vocabulary-grain aggregate (map-side combined), the scoring join
    * is token ⋈ vocabulary — at 100 TB the vocabulary table broadcasts
    * (a few M rows) and scoring is map-only. */
  def unigramLmScore(spark: SparkSession, dir: String,
      cutNats: Double = 8.0): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = tok.agg(count(lit(1)).as("n"),
      countDistinct("t").as("v")).collect()(0)
    val (n, v) = (totals.getLong(0), totals.getLong(1))
    val lp9 = floor(
      log((col("c") + 1).cast("double") / lit((n + v).toDouble))
        * lit(1000000000.0) + lit(0.5)).cast("long")
    val scored = tok.join(broadcast(vocab), "t")
      .select(col("doc_id"), lp9.as("lp9"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp9").as("slp9"))
      .withColumn("nll_nats",
        -(col("slp9").cast("double") / 1000000000.0) / col("n_tokens"))
    scored
      .select(col("doc_id"), col("n_tokens"),
        graft.util.Portable.val6(col("nll_nats")).as("nll_nats"),
        (col("nll_nats") <= cutNats).as("keep"))
      .orderBy("doc_id")
  }

  /** q180: per-source data card — the "datasheet for datasets" mart a
    * corpus vendor publishes per ingest source: volume (docs, tokens),
    * language-mix entropy (how monolingual the source is), mean lexical
    * diversity (type-token ratio), and the near-duplicate rate (what
    * fraction of the source's docs have a near-dup partner anywhere in
    * the corpus — the q33 pair graph restated at source grain).
    *
    * Determinism: entropy terms and per-doc TTRs floor-scale to
    * integers BEFORE their cross-row sums. Scale: everything reduces
    * to source grain (20 rows here, maybe thousands in production)
    * with map-side combine; the only non-scan input is the already-
    * bounded near-dup pair list. */
  def sourceDataCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("n_types"))
      .withColumn("ttr6",
        floor(col("n_types").cast("double") / col("n_tokens")
          * lit(1000000.0) + lit(0.5)).cast("long"))
    // language-mix entropy per source: Σ −p ln p, nano-scaled terms
    val lc = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val ln9 = {
      val p = col("c").cast("double") / col("nd")
      floor(-(p * log(p)) * lit(1000000000.0) + lit(0.5)).cast("long")
    }
    val ent = lc
      .join(d.groupBy("source").agg(count(lit(1)).as("nd")), "source")
      .withColumn("e9", ln9)
      .groupBy("source").agg(sum("e9").as("se9"))
    // near-dup rate: docs with any pair partner, at source grain
    val pairs = minhashNearDups(spark, dir)
    val dupIds = pairs.select(col("ida").as("doc_id"))
      .union(pairs.select(col("idb").as("doc_id"))).distinct()
    val dupBySrc = d.join(dupIds, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_dup"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("ttr6").as("sttr6"))
      .join(ent, "source")
      .join(dupBySrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("se9").cast("double") / 1000000000.0).as("lang_entropy"),
        (col("sttr6").cast("double") / 1000000.0 / col("n_docs"))
          .as("mean_ttr"),
        (coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_docs"))
          .as("dup_rate"))
      .orderBy("source")
  }

  /** q181: n-gram novelty audit — the memorization-risk profile: per
    * document, the fraction of its DISTINCT 3-gram shingles that occur
    * in no other document. Low-novelty docs are near-verbatim recombinations
    * of corpus material (template spam, boilerplate); the same statistic
    * against a TRAINED corpus is the memorization audit an eval suite
    * runs. One shingle-grain document-frequency aggregate (map-side
    * combined), one semi-join back — both at shingle grain, never
    * all-pairs. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Shingle through the typed kernel (the q201 discipline — the
    // Column form re-evaluates split() per emitted element, O(n²) in
    // a document's token count), once, checkpointed for its two
    // consumers. Earlier shapes shuffled the FULL (doc_id, shingle)
    // expansion (first via agg+join, then via a window — 8.0 s and
    // ~4.9 s at sf0.1). The trick that removes the fat shuffle
    // entirely: a shingle with df = 1 has exactly ONE owning document,
    // so min(doc_id) riding the df aggregate IS the owner — per-doc
    // unique counts come from re-aggregating only the df=1 rows
    // (shingle-grain, map-side combined) with no join back to the
    // expansion, and n_shingles is scan-local (array size).
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, shinglesOf(t).distinct)
      })
      .toDF("doc_id", "toks")
      .localCheckpoint()
    val perDoc = sig.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_shingles"))
    val uniq = sig.select(col("doc_id"), explode(col("toks")).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("df"), min("doc_id").as("doc_id"))
      .filter(col("df") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        graft.util.Portable.val6(
          coalesce(col("n_unique"), lit(0L)).cast("double")
            / col("n_shingles"))
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** q173: cross-corpus contamination report — the near-dup pairs that
    * STRADDLE two corpora (here: even- vs odd-numbered sources, the
    * stand-in for "my crawl" vs "the benchmark/partner corpus"). Rides
    * the q33 banded MinHash join unchanged — candidate generation never
    * goes all-pairs — then keeps only pairs whose endpoints disagree on
    * corpus parity. The report a data vendor runs before shipping:
    * which of my documents already exist, near-verbatim, on the other
    * side of the fence. */
  def crossSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashNearDups(spark, dir)
    val src = Tables.documents(spark, dir).select(col("doc_id"),
      col("source"),
      (substring(col("source"), 4, 10).cast("int") % 2).as("par"))
    val a = src.select(col("doc_id").as("ida"),
      col("source").as("source_a"), col("par").as("pa"))
    val b = src.select(col("doc_id").as("idb"),
      col("source").as("source_b"), col("par").as("pb"))
    pairs.join(a, "ida").join(b, "idb")
      .filter(col("pa") =!= col("pb"))
      .select(col("ida"), col("idb"), col("source_a"), col("source_b"),
        col("jaccard"))
      .orderBy("ida", "idb")
  }

  /** q184: temperature-scaled mixture sampling — the multilingual
    * training-mix knob (sampling weight ∝ count^α, here α = 0.5):
    * upsamples the tail languages relative to their raw share without
    * letting the head dominate. Unlike the rate-based thresholds of
    * q149 (Bernoulli-style keep per doc), this draws an EXACT
    * per-language target count n_l = floor(B · w_l / Σw) and selects
    * precisely the n_l docs with the smallest seeded hash — the
    * "exact budget" contract a token-budgeted pretraining mix needs.
    *
    * Determinism: w_l = sqrt(c_l) floor-scales to BIGINT nano-units
    * before the cross-language sum; targets use pure 64-bit integer
    * multiply/div; selection ranks on the portable doc hash with
    * doc_id tie-break. Scale: language counts are a tiny map-side
    * combinable agg (broadcast back); ranking partitions BY LANGUAGE
    * (parallel across languages) — within one giant language the
    * two-phase q160 prefix-sum rank is the drop-in replacement, same
    * as q172. */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("w9",
        floor(sqrt(col("c").cast("double")) * lit(1000000000.0) + lit(0.5))
          .cast("long"))
    val ww: Long = counts.agg(sum("w9")).as[Long].head()
    val b: Long = d.count() / 2
    val targets = counts.withColumn("n_target",
      expr(s"(${b}L * w9) div ${ww}L"))
    val ranked = d
      .withColumn("hk", Portable.portable32(
        concat(lit("tmix:"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("hk"), col("doc_id"))))
    ranked.join(broadcast(targets), "lang")
      .select(col("doc_id"), col("lang"), col("c"), col("n_target"),
        col("rn").as("rank"), (col("rn") <= col("n_target")).as("keep"))
      .orderBy("doc_id")
  }

  /** q189: data selection via importance resampling (DSIR) — score
    * every document by the log-likelihood ratio between an in-domain
    * target LM and the raw-corpus LM (both add-one-smoothed unigram
    * models over the shared corpus vocabulary; target = the `src0`
    * source, the "high-quality exemplar" slice), then select the
    * top 10% by ratio under an exact global rank. The classic recipe
    * for tilting a web-scale crawl toward a target domain without a
    * trained classifier.
    *
    * Determinism: each term's log-ratio floor-scales to BIGINT
    * micro-units BEFORE the per-doc sum; the global rank runs on a
    * strictly monotone integer composite of (-score, doc_id) through
    * the two-phase [[Relational.globalRankedPrefixSum]] — no
    * single-partition sort — and carries the cumulative selected
    * token count alongside (the budget curve a mixture planner
    * reads). Scale: two vocabulary-grain aggregates (map-side
    * combined, broadcast back), scoring is one token ⋈ vocab join,
    * ranking is the q160 two-phase machinery. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
    val cr = d.groupBy("t").agg(count(lit(1)).as("cr"))
    val ct = d.filter(col("source") === "src0")
      .groupBy("t").agg(count(lit(1)).as("ct"))
    val nr = d.count()
    val nt = d.filter(col("source") === "src0").count()
    val v = cr.count()
    val b = Tables.documents(spark, dir).count() / 10
    val lr6 = floor(
      (log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
          / lit((nt + v).toDouble))
        - log((col("cr") + 1).cast("double") / lit((nr + v).toDouble)))
        * lit(1000000.0) + lit(0.5)).cast("long")
    val scored = d
      .join(broadcast(cr), "t")
      .join(broadcast(ct), Seq("t"), "left")
      .select(col("doc_id"), lr6.as("lr6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr6").as("slw6"))
      // strictly monotone integer image of (-score, doc_id): doc_id
      // stays well under 2^24, |slw6| well under 2^34
      .withColumn("skey",
        (lit(17179869184L) - col("slw6")) * lit(16777216L) + col("doc_id"))
    Relational.globalRankedPrefixSum(scored, "skey", "n_tokens",
        "rank", "cum_tokens")
      .select(col("doc_id"), col("n_tokens"),
        graft.util.Portable.val6(col("slw6").cast("double") / lit(1000000.0))
          .as("logw"),
        col("rank"), col("cum_tokens"), (col("rank") <= b).as("keep"))
      .orderBy("doc_id")
  }

  /** q194: weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, deterministic): each document draws u from its portable
    * hash and competes on key = ln(u)/w with w = its token count, so
    * longer (here: weight-favored) docs win proportionally more often
    * — one distributed pass, no sequential reservoir. The top-20% by
    * key form the sample: the row-level weighted draw that composes
    * with (rather than duplicates) the group-level temperature mix
    * (q184); weight by a quality score instead of length and this is
    * quality-propensity sampling.
    *
    * Determinism: u = (hash+1)/2^32 and ln(u)/w are identical
    * expression trees on both engines; keys floor-scale to BIGINT
    * nano-units and rank through the two-phase global rank on a
    * monotone integer composite with doc_id ties — no
    * single-partition sort. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"))
    val b = Tables.documents(spark, dir).count() / 5
    val u = (Portable.portable32(concat(lit("ws:"),
      col("doc_id").cast("string"))) + 1).cast("double") /
      lit(4294967296.0)
    // A-ES: pick the B largest u^(1/w) ⇔ the B largest ln(u)/w
    val s9 = floor(log(u) / col("w").cast("double") * lit(1000000000.0)
      + lit(0.5)).cast("long")
    val keyed = d.withColumn("s9", s9)
      // monotone integer image of (-s9, doc_id): |s9| < 2^36
      .withColumn("skey",
        (lit(68719476736L) - col("s9")) * lit(16777216L) + col("doc_id"))
    Relational.globalRankedPrefixSum(keyed, "skey", "w",
        "rank", "cum_tokens")
      .select(col("doc_id"), col("w").as("n_tokens"),
        graft.util.Portable.val6(col("s9").cast("double") / lit(1000000000.0))
          .as("key"),
        col("rank"), col("cum_tokens"), (col("rank") <= b).as("keep"))
      .orderBy("doc_id")
  }

  /** Term-grain posting statistics (t, df, tf) of a corpus frame —
    * the stored artifact behind BM25 (q182) and the unit of
    * [[postingStatsIncremental]]'s merge. */
  private[graft] def postingStatsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("t")
      .agg(count(lit(1)).as("df"), sum("c").as("tf"))

  /** q196: incremental text-index maintenance — the text sibling of
    * the incremental IVF path (q158): the posting statistics of the
    * PREVIOUS corpus snapshot (doc_id % 6 != 0) are a STORED parquet
    * artifact (staged once per fixture signature, `_READY`-marked);
    * an ingest computes stats over the DELTA only and merges them
    * additively at vocabulary grain (full-outer on term, coalesced
    * sums). The hash gate proves stored + delta ≡ the from-scratch
    * stats of the full corpus, row for row.
    *
    * Scale: per ingest the corpus-sized work is the delta aggregate;
    * the merge touches vocabulary-grain rows (millions, not
    * trillions). df/tf are additive, so APPENDS need no recompute;
    * re-crawls/deletes go through the keyed DeltaLog state path
    * (q162's commit discipline) or a census-cadence rebuild — the
    * same contract the IVF index ships. */
  def postingStatsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val fixture = s"$dir/documents.parquet"
    val staged = graft.streaming.FixtureStaging.stageOnce(
      "posting_stats", fixture,
      s"${System.getProperty("java.io.tmpdir")}/graft_posting_stats") { d =>
      postingStatsOf(Tables.documents(spark, dir)
          .filter(col("doc_id") % 6 =!= 0))
        .write.mode("overwrite").parquet(d.resolve("stats").toString)
    }
    val stored = spark.read.parquet(s"$staged/stats")
      .select(col("t"), col("df").as("dfp"), col("tf").as("tfp"))
    val delta = postingStatsOf(Tables.documents(spark, dir)
        .filter(col("doc_id") % 6 === 0))
      .select(col("t"), col("df").as("dfd"), col("tf").as("tfd"))
    stored.join(delta, Seq("t"), "full_outer")
      .select(col("t"),
        (coalesce(col("dfp"), lit(0L)) + coalesce(col("dfd"), lit(0L)))
          .as("df"),
        (coalesce(col("tfp"), lit(0L)) + coalesce(col("tfd"), lit(0L)))
          .as("tf"))
      .orderBy("t")
  }

  /** q232: posting-stats DELETE maintenance — the retraction half of
    * q196 (whose additive merge covers appends): the full corpus's
    * (t, df, tf) statistics are the STORED artifact; a tombstone batch
    * arrives through the keyed [[graft.sources.DeltaLog]] change feed
    * (the q231 plumbing, document-keyed) and the index updates by
    * SUBTRACTION — re-tokenize ONLY the deleted documents, decrement
    * df/tf at vocabulary grain, drop terms whose df reaches zero (a
    * term whose last document was retracted must not linger with a
    * zero row — BM25 reads this table and df=0 is a divide-by-zero).
    *
    * Scale: the corpus-sized work happened once at artifact build; per
    * retraction batch the work is tokenizing the deleted docs (batch-
    * sized) plus a vocabulary-grain merge — df/tf are additive, so
    * subtraction is exact, no census rebuild. The driver gate proves
    * it: the oracle recomputes the stats of the post-delete corpus
    * from scratch. */
  def postingStatsWithDeletes(spark: SparkSession, dir: String): DataFrame = {
    val fixture = s"$dir/documents.parquet"
    val staged = graft.streaming.FixtureStaging.stageOnce(
      "posting_stats_full", fixture,
      s"${System.getProperty("java.io.tmpdir")}/graft_posting_full") { d =>
      postingStatsOf(Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(d.resolve("stats").toString)
    }
    val stored = spark.read.parquet(s"$staged/stats")
      .select(col("t"), col("df").as("dfp"), col("tf").as("tfp"))
    val tomb = graft.sources.DeltaLog.stagedTombstones(spark, "docdel",
      fixture, Tables.documents(spark, dir).select(col("doc_id")),
      col("doc_id") % 7 === 3, "doc_id")
    val del = postingStatsOf(
        Tables.documents(spark, dir).join(tomb, "doc_id"))
      .select(col("t"), col("df").as("dfd"), col("tf").as("tfd"))
    // left join: a delete can only touch terms the stored vocabulary
    // already has — a term appearing only in deleted docs is in both
    stored.join(del, Seq("t"), "left")
      .select(col("t"),
        (col("dfp") - coalesce(col("dfd"), lit(0L))).as("df"),
        (col("tfp") - coalesce(col("tfd"), lit(0L))).as("tf"))
      .filter(col("df") > 0)
      .orderBy("t")
  }

  /** q200: corpus release manifest — the one-row card stamped onto a
    * training-data release: ingest volume, scored volume (eval
    * registry held out), released volume with the yield rate, how
    * many near-dup copies the dedup stage alone removed, REMOVED
    * content (tombstoned retractions — count and token mass — the
    * GDPR/re-crawl accounting a release card must reconcile, fed by
    * the same [[graft.sources.DeltaLog]] retraction log q232's
    * posting-stats maintenance consumes), the released token budget,
    * and the leakage-safe train/val/test sizes. Every number derives
    * from already-gated stages (q145 verdicts, q165 splits, q231/q232
    * tombstones) — the manifest is their composition, which is
    * exactly what a release pipeline publishes alongside the shards.
    * Released volumes and splits are POST-DELETE: a retracted document
    * never ships, whatever its curation verdict said.
    *
    * Scale: four 1-row reductions plus doc-keyed joins; nothing
    * beyond the verdict chain's own cost. */
  def releaseManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // ONE pair closure feeds both the dedup verdict and the split
    // assignment (they recompute it independently when run standalone
    // as q145/q165); localCheckpoint pins the component-grain result —
    // a few rows per duplicate cluster — so neither consumer re-runs
    // the band join + CC. Measured: q200 9.1 s → ~6 s at sf0.1.
    val pairs = minhashNearDups(spark, dir).select("ida", "idb")
    // componentsAuto (r10): same shared-closure contract, 2 jobs
    // instead of O(diameter) rounds on the cluster-sized pair graph
    val comp = Graphs.componentsAuto(pairs, "ida", "idb")
      .withColumnRenamed("id", "doc_id")
      .localCheckpoint()
    val ded = Graphs.dedupClustersFromComp(spark, dir, comp)
      .select(col("doc_id"), col("is_canonical").as("dedup_ok"))
    // the verdict table feeds TWO separate driver actions (`eligible`'s
    // checkpoint and the final job's `scored` aggregate) — without this
    // the whole verdict chain (lang/quality/repetition/decontamination
    // joins) re-executes once per consumer (r11, guide §1.2; the q216
    // pattern). doc_id + 6 booleans: narrower than any one stage's own
    // shuffle at every scale.
    val v = curationVerdictsWithDed(spark, dir, ded).localCheckpoint()
    val tomb = graft.sources.DeltaLog.stagedTombstones(spark, "docdel",
      s"$dir/documents.parquet", docs.select(col("doc_id")),
      col("doc_id") % 7 === 3, "doc_id")
    // release-eligible per curation; the tombstones then split it into
    // shipped vs retracted — the two masses the card reconciles
    val eligible = v.filter(col("keep")).select("doc_id")
      .localCheckpoint()
    val released = eligible.join(tomb, Seq("doc_id"), "left_anti")
      .localCheckpoint() // token mass + splits both consume it
    val removed = eligible.join(tomb, Seq("doc_id"), "left_semi")
    val nTok = sum(size(split(col("text"), " ")).cast("long"))
    val scored = v.agg(
      count(lit(1)).as("n_scored"),
      sum(when(col("lang_ok") && col("quality_ok") && col("rep_ok")
        && col("decon_ok") && !col("dedup_ok"), 1L).otherwise(0L))
        .as("n_dup_dropped"))
    val relStats = docs.join(released, "doc_id")
      .agg(count(lit(1)).as("n_released"),
        nTok.as("n_tokens_released"))
    val rmStats = docs.join(removed, "doc_id")
      .agg(count(lit(1)).as("n_removed"),
        coalesce(nTok, lit(0L)).as("n_tokens_removed"))
    val splits = Graphs.leakageSafeSplitFromComp(spark, dir, comp)
      .join(released, "doc_id")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val n = docs.agg(count(lit(1)).as("n_ingested"))
    n.crossJoin(scored).crossJoin(relStats).crossJoin(rmStats)
      .crossJoin(splits)
      .select(col("n_ingested"), col("n_scored"), col("n_released"),
        (col("n_released").cast("double") / col("n_scored"))
          .as("release_rate"),
        col("n_dup_dropped"), col("n_removed"), col("n_tokens_removed"),
        col("n_tokens_released"),
        col("n_train"), col("n_val"), col("n_test"))
  }

  /** q183's subword vocabulary — the single source of truth for BOTH
    * the Spark segmenter and the oracle's unrolled SQL replay.
    * Multi-char pieces cover the corpus words in 1–3 hops; single
    * letters are the fallback; 'q' is deliberately absent so the
    * [UNK] path ("query" has no matching prefix) stays exercised. */
  val WpVocab: Seq[String] = Seq(
    "wind", "ow", "tab", "le", "cus", "tom", "er", "str", "eam",
    "val", "ue", "vec", "tor", "ord", "col", "umn", "sort", "spark",
    "small", "slow", "scan", "row", "part", "merge", "line", "key",
    "join", "hash", "group", "filter", "fast", "dup", "data", "batch",
    "big", "agg", "the",
    "a", "b", "c", "d", "e", "g", "h", "i", "k", "l", "m", "n", "o",
    "p", "r", "s", "t", "u", "v", "w", "y")

  /** Greedy longest-match segmentation of one word against
    * [[WpVocab]] (WordPiece-style apply, position-independent
    * pieces). Returns (pieces, unk): a word with NO matching prefix
    * at the current position becomes one [UNK] token, consuming the
    * rest — the standard WordPiece contract. At most one piece of a
    * given length can match a fixed position, so "longest first" is
    * unambiguous. */
  def wordpieceSegment(word: String): (Int, Int) = {
    var pos = 0; var np = 0; var unk = 0; var done = word.isEmpty
    while (!done) {
      var best: String = null
      WpVocab.foreach { p =>
        if (word.startsWith(p, pos) &&
            (best == null || p.length > best.length)) best = p
      }
      if (best == null) { np += 1; unk += 1; done = true }
      else { np += 1; pos += best.length; done = pos >= word.length }
    }
    (np, unk)
  }

  /** q183: tokenizer-faithful subword statistics — apply a fixed
    * subword vocabulary with greedy longest-match (the WordPiece
    * inference rule) and report per-document piece counts, [UNK]
    * counts and fertility (pieces per word), the metric tokenizer
    * evaluations actually use. Whitespace token counts (q27)
    * under-estimate sequence lengths; piece counts are what a
    * training-budget or packing decision (q136/q172) needs.
    *
    * Scale shape: segmentation runs at DISTINCT-WORD grain — the
    * corpus vocabulary, not the corpus — as one scan-local pass with
    * the piece list in the task closure; results broadcast-join back
    * to the (doc, word, count) table and reduce with map-side
    * combinable integer sums. At 100 TB the distinct-word table is
    * a few million rows against trillions of tokens, so the
    * expensive loop never touches the big side. Determinism: pure
    * integer arithmetic end-to-end; the oracle replays the greedy
    * loop as unrolled argmax-prefix steps over the same vocabulary. */
  def wordpieceStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val cnt = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val words = cnt.select("t").distinct().as[String]
      .mapPartitions(_.map { w =>
        val (np, nu) = wordpieceSegment(w); (w, np, nu)
      })
      .toDF("t", "np", "nu")
    cnt.join(broadcast(words), "t")
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("np")).as("n_pieces"),
        sum(col("c") * col("nu")).as("n_unk"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        col("n_unk"),
        graft.util.Portable.val6(
          col("n_pieces").cast("double") / col("n_words"))
          .as("fertility"))
      .orderBy("doc_id")
  }

  /** q210 — dedup-aware sampling weights at source grain: instead of
    * DROPPING near-duplicates (q159's retention policy), weight every
    * copy by 1/cluster_size so a document's content carries the same
    * total sampling mass however many times it was crawled — the
    * soft-dedup mixture correction (the public alternative to hard
    * removal when near-dups carry distinct metadata). Reports, per
    * source, raw vs EFFECTIVE token volume and the duplication
    * inflation the mixture planner must divide out.
    *
    * Determinism: per-doc effective mass tokens/cluster_size is a
    * rational — floor-scaled to micro-units per doc (one IEEE divide +
    * floor, identical in both engines), then summed as integers.
    * Scale: rides the q65 closure the dedup pass already ran; the scan
    * side is one map + source-grain reduce. */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Graphs.dedupClustersAuto(spark, dir)
      .select(col("doc_id"), col("cluster_size"))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    d.join(clusters, "doc_id")
      .withColumn("eff6",
        floor(col("n_tokens").cast("double") * lit(1000000.0)
          / col("cluster_size").cast("double")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L))
          .as("n_dup_docs"),
        sum("n_tokens").as("raw_tokens"),
        sum("eff6").as("eff6"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("raw_tokens"),
        graft.util.Portable.val6(
          col("eff6").cast("double") / lit(1000000.0))
          .as("effective_tokens"),
        graft.util.Portable.val6(
          col("raw_tokens").cast("double")
            / (col("eff6").cast("double") / lit(1000000.0)))
          .as("inflation"))
      .orderBy("source")
  }

  /** q213 — curriculum staging: the corpus ordered easy → hard by the
    * unigram-LM difficulty (q178's per-doc NLL, kept as an integer
    * micro-nat key) and cut into exact global quartile stages, reported
    * as a (stage × source) composition mart — the schedule a
    * curriculum-learning run feeds from, with per-stage token budgets.
    *
    * Exactness without a global sort: ranks come from
    * [[Relational.globalRankedPrefixSum]]'s two-phase range-partition
    * rank over the total key (difficulty, doc_id) — no
    * Exchange SinglePartition — and the stage is the closed-form NTILE
    * assignment from the rank (first n mod k stages take ⌈n/k⌉), so
    * the oracle's NTILE window lands on identical buckets. */
  def curriculumStages(spark: SparkSession, dir: String,
      stages: Int = 4): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = tok.agg(count(lit(1)).as("n"),
      countDistinct("t").as("v")).collect()(0)
    val (nTok, v) = (totals.getLong(0), totals.getLong(1))
    val lp9 = floor(
      log((col("c") + 1).cast("double") / lit((nTok + v).toDouble))
        * lit(1000000000.0) + lit(0.5)).cast("long")
    val perDoc = tok.join(broadcast(vocab), "t")
      .select(col("doc_id"), lp9.as("lp9"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp9").as("slp9"))
      .withColumn("dm", floor((lit(0L) - col("slp9")).cast("double")
        / col("n_tokens") / lit(1000.0)).cast("long"))
    val scored = perDoc
      .join(Tables.documents(spark, dir).select("doc_id", "source"),
        "doc_id")
      .withColumn("_key", struct(col("dm"), col("doc_id")))

    val n = scored.count()
    val ranked = Relational.globalRankedPrefixSum(
      scored, "_key", "n_tokens", "rank", "cum_tokens")
    ranked.withColumn("stage",
        Relational.ntileFromRank(col("rank"), n, stages).cast("int"))
      .groupBy("stage", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("dm").as("sdm"))
      .select(col("stage"), col("source"), col("n_docs"), col("n_tokens"),
        graft.util.Portable.val6(col("sdm").cast("double")
          / col("n_docs").cast("double") / lit(1000000.0))
          .as("mean_nll"))
      .orderBy("stage", "source")
  }

  /** q214 — cross-source duplication matrix: the q33 near-dup pair
    * graph restated at (source, source) grain — which ingest sources
    * mirror each other's content. The off-diagonal cells are what a
    * mixture planner reads before weighting two "independent" sources
    * that are actually the same crawl twice; the diagonal is
    * within-source redundancy. Rides the already-bounded banded pair
    * list; the matrix reduce is source²-grain metadata. */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashNearDups(spark, dir).select("ida", "idb")
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    pairs
      .join(src.select(col("doc_id").as("ida"), col("source").as("sa")),
        "ida")
      .join(src.select(col("doc_id").as("idb"), col("source").as("sb")),
        "idb")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** q228 — exact content-overlap matrix between sources: for every
    * source pair, the Jaccard of their CONTENT-FINGERPRINT sets (the
    * q30 [[contentFp]] key) — the exact-duplication complement of
    * q214's near-dup pair counts. A high cell means two "independent"
    * ingest feeds are the same crawl; the mixture planner reads this
    * before assigning them separate weights, and the dedup budget
    * planner reads it to predict cross-source drop volume.
    *
    * Shape: distinct (source, fp) pairs (one reduce), pair
    * intersections from a self-join keyed on the FINGERPRINT (bucket
    * size = how many sources share one content item — bounded by
    * \|sources\|), source set sizes re-aggregate the same grain. Never
    * \|sources\|² × corpus work. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val fps = Tables.documents(spark, dir)
      .select(col("source"), contentFp(col("text")).as("fp"))
      .distinct()
      .localCheckpoint() // sizes + both self-join sides
    val sizes = fps.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    val cross = inter
      .join(sizes.select(col("source").as("source_a"), col("n").as("na")),
        "source_a")
      .join(sizes.select(col("source").as("source_b"), col("n").as("nb")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("na"), col("nb"),
        col("n_shared"),
        graft.util.Portable.val6(col("n_shared").cast("double")
          / ((col("na") + col("nb")).cast("double")
            - col("n_shared").cast("double"))).as("jaccard"))
    // diagonal rows keep the matrix total (every source always
    // reports), and their n_shared = the source's distinct-content
    // size — a clean-corpus gate never degenerates to zero rows
    val diag = sizes.select(col("source").as("source_a"),
      col("source").as("source_b"), col("n").as("na"),
      col("n").as("nb"), col("n").as("n_shared"),
      lit(1.0).as("jaccard"))
    cross.unionByName(diag).orderBy("source_a", "source_b")
  }

  /** q226 — Good–Turing unseen-mass estimation: the probability that
    * the NEXT token drawn from the stream is a type never seen before
    * is ≈ N₁/N (hapax count over total tokens) — Turing's estimator,
    * the quantity behind "how much new vocabulary will the next ingest
    * bring" and the smoothing mass every open-vocabulary LM reserves.
    * Ships with the doubleton count (the next Good–Turing term) and the
    * hapax share of the vocabulary (Heaps-regime indicator: a corpus
    * still at ~50% hapax is nowhere near vocabulary saturation).
    *
    * One vocabulary-grain reduce; every statistic is exact integers
    * with one division at the edge. */
  def unseenMass(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    vocab.agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("n_tokens"), col("n_types"), col("n_hapax"),
        col("n_doubletons"),
        graft.util.Portable.val6(col("n_hapax").cast("double")
          / col("n_tokens").cast("double")).as("unseen_mass"),
        graft.util.Portable.val6(col("n_hapax").cast("double")
          / col("n_types").cast("double")).as("hapax_share"))
  }

  /** q215 — distribution shift between splits: add-one-smoothed
    * KL(split ‖ train) over the corpus vocabulary, per split of the
    * leakage-safe assignment (q165). A near-zero value certifies the
    * component-hash split didn't skew content (the random-split
    * premise); a large one flags a val/test set that no longer
    * represents training — the audit run before trusting any held-out
    * metric.
    *
    * Determinism: per-(token, split) KL terms q·ln(q/p) nano-floor-
    * scale before the per-split integer sums (the q110/q178
    * discipline); train vs itself telescopes to exactly 0. Scale: token
    * counts reduce at (split, vocab) grain with map-side combine; the
    * term grid is vocab × |splits| — Heaps-sublinear — and everything
    * after is a 3-row reduce. */
  def splitDivergence(spark: SparkSession, dir: String): DataFrame = {
    val sp = Graphs.leakageSafeSplit(spark, dir)
      .select(col("doc_id"), col("split"))
      .localCheckpoint() // doc counts + the token join
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .join(sp, "doc_id")
    val cnt = tok.groupBy("split", "t").agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocab, totals, train slice, grid probe
    val voc = cnt.select("t").distinct()
    val v = voc.count()
    val nt = cnt.groupBy("split").agg(sum("c").as("n"))
    val tr = cnt.filter(col("split") === "train")
      .select(col("t"), col("c").as("ct"))
    val nTrain = nt.filter(col("split") === "train")
      .select(col("n").as("ntrain"))

    val grid = voc.crossJoin(broadcast(nt))
      .join(cnt, Seq("split", "t"), "left")
      .join(tr, Seq("t"), "left")
      .crossJoin(broadcast(nTrain))
      .select(col("split"), col("n"),
        coalesce(col("c"), lit(0L)).as("c0"),
        coalesce(col("ct"), lit(0L)).as("ct"), col("ntrain"))
    val qd = (col("c0") + 1).cast("double")
      ./((col("n") + lit(v)).cast("double"))
    val pd = (col("ct") + 1).cast("double")
      ./((col("ntrain") + lit(v)).cast("double"))
    val k9 = floor(qd * log(qd / pd) * lit(1000000000.0) + lit(0.5))
      .cast("long")
    val kl = grid.select(col("split"), k9.as("k9"))
      .groupBy("split").agg(sum("k9").as("sk9"))
    val nd = sp.groupBy("split").agg(count(lit(1)).as("n_docs"))
    nd.join(nt, "split").join(kl, "split")
      .select(col("split"), col("n_docs"), col("n").as("n_tokens"),
        graft.util.Portable.val6(
          col("sk9").cast("double") / lit(1000000000.0))
          .as("kl_vs_train"))
      .orderBy("split")
  }

  /** q211 — bigram language-model scoring (add-one smoothing), the
    * fluency filter one step up from q178's unigram LM: a doc of
    * common words in an impossible ORDER scores fine under unigrams
    * but poorly here — word-salad detection. P(w2|w1) =
    * (c(w1,w2)+1) / (c(w1·)+V); per-doc mean negative log-likelihood
    * over its bigram occurrences.
    *
    * The ln runs once per DISTINCT bigram (vocabulary²-bounded, in
    * practice Heaps-sublinear) and is nano-floor-scaled BEFORE the
    * per-doc integer sums — the q110/q178 transcendental discipline.
    * Counts are corpus-wide; the scored side prunes to the reporting
    * shard before the join. Scale: two vocabulary-grain aggregates +
    * one join keyed on the bigram; at 100 TB the bigram table is the
    * stored LM artifact (q196's posting discipline). */
  def bigramLmScore(spark: SparkSession, dir: String,
      maxDocId: Long = 100, cutNats: Double = 7.0): DataFrame = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = w.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .localCheckpoint() // counts (2 aggs) + the scored occurrences
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cc = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t")).collect()(0).getLong(0)
    val lp = bc.join(cc, "w1")
      .select(col("w1"), col("w2"),
        floor(log((col("c12") + 1).cast("double")
          / (col("c1") + lit(v)).cast("double"))
          * lit(1000000000.0) + lit(0.5)).cast("long").as("lp9"))
    bg.filter(col("doc_id") < maxDocId)
      .join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp9").as("slp9"))
      .withColumn("nll_nats",
        -(col("slp9").cast("double") / lit(1000000000.0))
          / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.util.Portable.val6(col("nll_nats")).as("nll_nats"),
        (col("nll_nats") <= cutNats).as("keep"))
      .orderBy("doc_id")
  }

  /** q240: EXACT shared-substring spans — the ExactSubstr half of
    * training-data dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): find every maximal k-token span
    * two documents share VERBATIM, with positions — what MinHash
    * (q32, set-grain) structurally can't see, and the evidence a
    * contamination/plagiarism audit needs (q142 flags the doc; this
    * names the span).
    *
    * Lee et al. build a monolithic suffix array; the distributed
    * re-derivation is window-grain dataflow: (1) a typed kernel emits
    * every k-token window with its position (the suffix array's role
    * is exactly to find repeated windows — a groupBy does that
    * shuffled); (2) windows shared by 2..maxDf docs survive (the df
    * cap is Lee et al.'s super-frequent-substring skip and the skew
    * guard: boilerplate shared by m docs is m² pairs — real pipelines
    * drop it as template text; the cap is MIRRORED in the oracle, the
    * q204 basket lesson); (3) position pairs meet on the window
    * value — one equi-join reusing the df shuffle's partitioning;
    * (4) adjacent matches merge into maximal spans per (pair,
    * diagonal) by gaps-and-islands arithmetic: consecutive posa on
    * one diagonal share posa − row_number.
    *
    * Scale: everything is window-grain (Σ doc_len rows); the only
    * fan-out is step 3, bounded by df ≤ maxDf. No suffix array, no
    * driver state. */
  def sharedSubstringSpans(spark: SparkSession, dir: String,
      k: Int = 8, maxDf: Int = 100): DataFrame = {
    import spark.implicits._
    val kk = k
    val wins = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val ts = text.split(" ")
        (0 to ts.length - kk).iterator
          .map(i => (id, i.toLong, ts.slice(i, i + kk).mkString(" ")))
      })
      .toDF("doc_id", "pos", "w")
    // ONE shuffle on the window value carries everything: occurrences
    // collect per window (bounded by the df cap × per-doc repeats), df
    // derives in-row, and position pairs expand in-row — no join-back,
    // no self-join re-shuffle of the corpus-sized window table
    val occ = wins.groupBy("w")
      .agg(collect_list(struct(col("doc_id"), col("pos"))).as("occ"))
      .withColumn("dfw",
        size(array_distinct(transform(col("occ"), o => o("doc_id")))))
      .filter(col("dfw") >= 2 && col("dfw") <= maxDf)
    val pairs = occ
      .select(explode(flatten(transform(col("occ"), a =>
        filter(
          transform(col("occ"), b => struct(
            a("doc_id").as("ida"), b("doc_id").as("idb"),
            a("pos").as("posa"), b("pos").as("posb"))),
          p => p("ida") < p("idb"))))).as("p"))
      .select(col("p.ida"), col("p.idb"), col("p.posa"), col("p.posb"))
    val isl = Window.partitionBy("ida", "idb", "diag").orderBy("posa")
    pairs.withColumn("diag", col("posa") - col("posb"))
      .withColumn("grp", col("posa") - row_number().over(isl))
      .groupBy("ida", "idb", "diag", "grp")
      .agg(min("posa").as("start_a"),
        (max("posa") - min("posa") + lit(kk.toLong)).as("span_tokens"))
      .select(col("ida"), col("idb"), col("start_a"),
        (col("start_a") - col("diag")).as("start_b"), col("span_tokens"))
      .orderBy("ida", "idb", "start_a", "start_b")
  }

  /** q247 — Zipf rank–frequency profile of the corpus vocabulary at
    * doubling ranks (1, 2, 4, …): the one-page fingerprint every
    * corpus card should carry. A natural corpus follows freq ∝
    * rank^(−s) with s ≈ 1, so the ratio freq(r)/freq(2r) sits near
    * 2^s ≈ 2 at every doubling; machine-generated or template-heavy
    * corpora bend the curve and show up immediately as drifting
    * doubling ratios. Reported WITHOUT logarithms on purpose: libm
    * `ln` is not guaranteed bit-identical across engines, while the
    * doubling ratio is one IEEE division ([[Portable.val6]]-scaled) —
    * the same determinism contract as every other gate float.
    *
    * Scale shape: vocabulary-grain counts (Heaps-law sublinear in the
    * corpus), then the (count DESC, token) rank through the two-phase
    * [[Relational.denseGlobalRank]] on q160's lexicographic key — no
    * single-partition ORDER BY. The doubling self-join runs on the
    * ≤14 power-of-two rows; everything after the one vocabulary
    * shuffle is metadata-sized. */
  def zipfProfile(spark: SparkSession, dir: String,
      maxRank: Long = 8192L): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // (freq DESC, token ASC) as one lexicographic key — q160's
    // 19-digit zero-padded complement prefix (see vocabCoverage)
    val keyed = counts.withColumn("_k",
      concat(
        lpad((lit(1000000000000000000L) - col("freq")).cast("string"),
          19, "0"),
        col("token")))
    val p = Relational.denseGlobalRank(keyed, "_k", "rk", base = 0L)
      .filter(col("rk") <= maxRank
        && (col("rk").bitwiseAND(col("rk") - 1)) === 0L)
      .select(col("rk"), col("token"), col("freq"))
      .localCheckpoint() // both sides of the tiny doubling join
    p.as("a")
      .join(p.as("b"), col("b.rk") === col("a.rk") * 2, "left")
      .select(
        col("a.rk").as("rk"),
        col("a.token").as("token"),
        col("a.freq").as("freq"),
        (col("a.freq") * col("a.rk")).as("zipf_product"),
        Portable.val6(col("a.freq").cast("double")
          / col("b.freq").cast("double")).as("doubling_ratio"))
      .orderBy("rk")
  }

  /** q291: token-budget epoch-mix plan — the per-source repeat-factor
    * schedule a pretraining run derives before sampling (the Llama-
    * style "epochs per source" table): given a token budget (half the
    * corpus here) split into uniform per-source targets, each source
    * repeats until it fills its target or hits the epoch cap
    * (4 epochs), whichever first. Repeat factors are micro-scaled
    * integers (`target·10⁶ div tokens`, floor), planned tokens divide
    * back — every cell is exact integer arithmetic, so the plan is
    * bit-reproducible and auditable (shortfall = target − planned is
    * the mass a capped source leaves for a rebalancing pass).
    *
    * Scale: one scan → per-source token sums (map-side combinable),
    * one broadcast of the 1-row corpus totals — the plan table is
    * source-grain metadata regardless of corpus size. */
  def epochMixPlan(spark: SparkSession, dir: String,
      budgetDen: Long = 2L, maxEpochsMicro: Long = 4000000L): DataFrame = {
    val bySource = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    val totals = bySource.agg(
      sum("n_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    bySource.crossJoin(broadcast(totals))
      .withColumn("target_tokens",
        expr(s"total_tokens div $budgetDen div n_sources"))
      .withColumn("repeat_micro",
        least(lit(maxEpochsMicro),
          expr("target_tokens * 1000000 div n_tokens")))
      .withColumn("planned_tokens",
        expr("n_tokens * repeat_micro div 1000000"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("repeat_micro"), col("planned_tokens"),
        (col("repeat_micro") === maxEpochsMicro).as("capped"),
        (col("target_tokens") - col("planned_tokens")).as("shortfall"))
      .orderBy("source")
  }

  /** q308 — Kneser–Ney smoothed bigram LM scoring: the modern
    * smoothing next to q211's add-one — absolute discounting plus the
    * CONTINUATION back-off (how many contexts a word follows, not how
    * often: "francisco" is frequent but follows only "san", so its
    * unigram back-off mass is tiny — the insight that makes KN the
    * default in every n-gram stack):
    *
    *   p(w|v) = (c(vw) − d)/c(v·) + d·N1+(v·)/c(v·) · N1+(·w)/N1+(··)
    *
    * with d = 0.75 (= 3/4, so 4·c − 3 keeps the discounted numerator
    * integral). Every count is an exact BIGINT; each bigram's log-prob
    * evaluates ONE fixed IEEE tree (stated operand-for-operand in the
    * oracle — the q263/q182 determinism class) and floor-scales to
    * nano-units before the per-doc sum, so document NLLs are exact.
    *
    * Scale: bigram/context/continuation counts are three map-side-
    * combinable aggregates off one explode pass; the scored slice
    * joins only its own bigrams (q211's shape). */
  def knBigramLmScore(spark: SparkSession, dir: String,
      maxDocId: Long = 100, cutNats: Double = 7.0): DataFrame = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = w.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .localCheckpoint() // three count aggs + the scored occurrences
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds n1p, nc, ntypes AND the score join
    val cc = bg.groupBy("w1").agg(count(lit(1)).as("c1b"))
    val n1p = bc.groupBy("w1").agg(count(lit(1)).as("n1p"))
    val nc = bc.groupBy("w2").agg(count(lit(1)).as("nc"))
    val ntypes = bc.count() // driver scalar: N1+(··), the q211-v class
    val p = ((col("c12") * 4 - 3).cast("double")
        / (col("c1b") * 4).cast("double")) +
      (lit(3.0) * col("n1p").cast("double")
        / (col("c1b") * 4).cast("double")) *
      (col("nc").cast("double") / lit(ntypes.toDouble))
    val lp = bc.join(cc, "w1").join(n1p, "w1").join(nc, "w2")
      .select(col("w1"), col("w2"),
        floor(log(p) * lit(1000000000.0) + lit(0.5)).cast("long")
          .as("lp9"))
    bg.filter(col("doc_id") < maxDocId)
      .join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp9").as("slp9"))
      .withColumn("nll_nats",
        -(col("slp9").cast("double") / lit(1000000000.0))
          / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.util.Portable.val6(col("nll_nats")).as("nll_nats"),
        (col("nll_nats") <= cutNats).as("keep"))
      .orderBy("doc_id")
  }

  /** q303 — chunk-grain near-duplicate detection: the q33 MinHash/LSH
    * machinery applied at the q93 CHUNK grain, surfacing document
    * pairs that share near-identical PASSAGES even when the documents
    * as a whole are distinct — boilerplate headers, quoted paragraphs,
    * licence blocks: the duplication document-grain MinHash (q33) is
    * structurally blind to (a shared paragraph inside two long
    * documents moves whole-doc Jaccard a few percent; the paragraph
    * itself is a 0.7+ chunk pair). The standard paragraph-dedup stage
    * of a corpus-curation pipeline, reported as a doc-pair mart:
    * shared-chunk count + the strongest chunk overlap.
    *
    * Scale: chunking is scan-local (q93); the chunk corpus rides the
    * EXACT q33 path — banded signatures, bucket-capped band equi-join,
    * exact Jaccard only on candidates — so cost is the q33 shape at
    * chunk cardinality, never all-pairs. Chunk keys pack as
    * doc_id·10⁵ + chunk_idx (the q93 window/stride bounds chunk_idx
    * far below 10⁵ for any document a curation pipeline chunks
    * whole). */
  def chunkNearDups(spark: SparkSession, dir: String,
      threshold: Double = NearDupJaccard): DataFrame = {
    val chunks = chunkDocs(spark, dir)
      .select((col("doc_id") * lit(100000L) + col("chunk_idx"))
        .as("doc_id"),
        col("chunk_text").as("text"))
    minhashNearDupsOn(chunks, threshold)
      .select(expr("ida div 100000").as("doc_a"),
        expr("idb div 100000").as("doc_b"), col("jaccard"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_chunk_pairs"),
        max("jaccard").as("max_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** q298 — tokenizer fertility by language: tokens-per-word (the
    * FERTILITY a tokenizer team tracks per language — high fertility
    * means the vocabulary under-serves that language and its documents
    * burn more context window per sentence) and chars-per-token, using
    * q56's regex pre-tokenizer as the subword proxy against the
    * whitespace word count. The canonical multilingual-budget gauge:
    * ratios are language-grain integers (micro-unit div), so the mart
    * is exact at any corpus size.
    *
    * Scale: ONE scan — both token counts are scan-local regex/split
    * kernels — into a map-side-combined language-grain aggregate. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    def n(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"),
        n("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]").as("tk"),
        length(col("text")).cast("long").as("ch"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("tk").as("n_tokens"), sum("ch").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        (expr("(n_tokens * 1000000L) div n_words").cast("double")
          / lit(1000000.0)).as("fertility"),
        (expr("(n_chars * 1000000L) div n_tokens").cast("double")
          / lit(1000000.0)).as("chars_per_token"))
      .orderBy("lang")
  }

  /** q315 — CCNet-style perplexity buckets (Wenzek et al. 2020): the
    * head/middle/tail TERCILE split of each language's documents by
    * language-model score that the CommonCrawl curation stack uses as
    * its quality gate (keep head+middle, drop tail). Scoring is q178's
    * exact integer unigram-LM derivation; the per-doc key is the
    * integer per-token NLL (nano-nats, integer div — no float
    * ordering), and the per-language tercile rank runs through ONE
    * [[Relational.denseGlobalRank]] two-phase pass over the composite
    * (lang, npt9, doc_id) key — per-language ranks recovered by
    * subtracting the 5-row broadcast language-offset frame, so there
    * is no per-language single-partition sort at any corpus size (the
    * q21/q268 distributed-rank discipline).
    *
    * Emits the mart a curation run publishes: per (lang, bucket) doc
    * and token volumes, the realized NLL band, language share, and
    * the keep verdict. */
  def ccnetPerplexityBuckets(spark: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = tok.agg(count(lit(1)).as("n"),
      countDistinct("t").as("v"),
      max(length(col("lang"))).as("maxlang")).collect()(0)
    val (n, v) = (totals.getLong(0), totals.getLong(1))
    // the 8-char rpad below is a WIDTH ASSUMPTION like the npt9/doc_id
    // digit bounds: two langs sharing an 8-char prefix would interleave
    // in the global rank and corrupt the tercile split SILENTLY (the
    // pad truncates, it doesn't overflow) — so the assumption is
    // enforced here, failing loudly if a fixture ever ships longer
    // language codes (ISO 639 + script tags peak at 7: "zh_Hant")
    val maxLangLen = if (totals.isNullAt(2)) 0 else totals.getInt(2)
    require(maxLangLen <= 8,
      s"q315 composite rank key pads lang to 8 chars but the corpus " +
        s"has a $maxLangLen-char language code; widen the rpad")
    val lp9 = floor(
      log((col("c") + 1).cast("double") / lit((n + v).toDouble))
        * lit(1000000000.0) + lit(0.5)).cast("long")
    val scored = tok.join(broadcast(vocab), "t")
      .select(col("doc_id"), col("lang"), lp9.as("lp9"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum("lp9").as("slp9"))
      .withColumn("npt9", expr("(-slp9) div n_tokens"))
    // stated widths: npt9 ≤ ~3e10 (11 digits; per-token nats < 30),
    // doc_id < 1e12 (the ScaleGen 100× remap peaks at 10 digits) — an
    // overflow would reorder the composite and fail the hash gate
    // loudly, never silently; lang ≤ 8 chars asserted above
    val key = concat_ws("|", rpad(col("lang"), 8, " "),
      lpad(col("npt9").cast("string"), 15, "0"),
      lpad(col("doc_id").cast("string"), 12, "0"))
    val ranked = Relational.denseGlobalRank(
      scored.withColumn("_k", key), "_k", "grk", 0L)
    val offsets = scored.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .withColumn("off", coalesce(sum("n_lang").over(
        Window.orderBy("lang")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val bucketed = ranked.join(broadcast(offsets), "lang")
      .withColumn("r", col("grk") - col("off"))
      .withColumn("bucket",
        when(col("r") * 3 <= col("n_lang"), lit("head"))
          .when(col("r") * 3 <= col("n_lang") * 2, lit("middle"))
          .otherwise(lit("tail")))
    bucketed.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("npt9").as("lo9"), max("npt9").as("hi9"),
        max("n_lang").as("n_lang"))
      .select(col("lang"), col("bucket"), col("n_docs"), col("n_tokens"),
        (col("lo9").cast("double") / lit(1.0e9)).as("nll_lo"),
        (col("hi9").cast("double") / lit(1.0e9)).as("nll_hi"),
        graft.util.Portable.val6(col("n_docs").cast("double")
          / col("n_lang").cast("double")).as("share"),
        (col("bucket") =!= "tail").as("kept"))
      .orderBy("lang", "bucket")
  }
}
