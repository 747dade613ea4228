package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable

/** EXACT set-similarity self-join via AllPairs/PPJoin-style prefix
  * filtering (Bayardo et al., WWW'07; Xiao et al., WWW'08 — public
  * algorithms, re-derived here for the Spark dataflow).
  *
  * The LSH banding path (TextOps.minhashNearDups) is probabilistic: a
  * near-dup pair can land in no common band and silently vanish. This
  * operator returns EVERY pair with Jaccard ≥ t — the guarantee a
  * deletion-compliance or contamination audit needs — while still never
  * going all-pairs quadratic:
  *
  *  1. one document-frequency pass orders the shingle vocabulary from
  *     rare to common (ties broken lexically so the order is total and
  *     deterministic);
  *  2. each document keeps only its PREFIX under that global order —
  *     the first  m − ⌈t·m⌉ + 1  of its m shingles. For any pair with
  *     J ≥ t the smallest shared shingle w sits within both prefixes:
  *     all |∩| ≥ ⌈t·m⌉ intersection shingles rank ≥ pos(w), so
  *     pos(w) ≤ m − ⌈t·m⌉ + 1 on both sides — no false negatives;
  *  3. candidates come from an equi-join on the prefix shingle (shuffle
  *     keyed on the shingle — and prefixes are the RAREST shingles, so
  *     bucket sizes are small by construction), pruned further by the
  *     length filter  t·max(|a|,|b|) ≤ min(|a|,|b|)  (J ≥ t forces
  *     |∩| ≥ t·|∪| ≥ t·max, and |∩| ≤ min);
  *  4. only surviving candidates pay the exact intersection check.
  *
  * Scale: the only corpus-sized shuffles key on (shingle) and (doc_id)
  * — both high-cardinality and skew-free after the rarity ordering
  * (a shingle shared by many docs is by definition common, hence almost
  * never in a prefix at useful thresholds). The df vocabulary pass is a
  * map-side-combined count. At 100 TB the same plan runs unchanged;
  * the prefix join inherits VectorOps.withBucketCap if a degenerate
  * corpus ever makes one prefix shingle hot.
  */
object PrefixJoin {

  /** All pairs of documents with shingle-set Jaccard ≥ `threshold`,
    * exactly (no LSH approximation). Output: (ida, idb, jaccard).
    *
    * Shingling runs through the typed Scala kernel
    * ([[TextOps.shinglesOf]]), not the Column [[TextOps.shingles]]:
    * the Column form inlines `split(text)` into every element of the
    * shingle transform, making one document's shingling O(n²) in its
    * token count (the q33 lesson — its MinHash signatures use the same
    * typed tier). 3.4× end-to-end on the sf0.1 corpus. */
  def similarityJoin(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, TextOps.shinglesOf(t).distinct)
      })
      .toDF("doc_id", "toks")
    similarityJoinOf(docs, threshold)
  }

  /** q209 — exact CONTAINMENT join: every (eval doc, corpus doc) pair
    * where ≥ `threshold` of the eval doc's shingles appear in the
    * corpus doc, C(A→B) = |A∩B| / |A|. The asymmetric complement of
    * [[similarityJoin]]: a 200-token eval question quoted inside a
    * 5 000-token web page has near-zero Jaccard but containment ≈ 1 —
    * the decontamination case symmetric measures (and q142's
    * whole-fingerprint rule) structurally miss.
    *
    * Same AllPairs machinery, adapted to the one-sided bound: only the
    * EVAL side gets a prefix (α = ⌈t·|A|⌉ depends on |A| alone, so B
    * admits no safe prefix and indexes ALL its shingles — the standard
    * containment-join asymmetry); both sides keep rarity positions, and
    * the first-shared-token positional bound
    * 1 + min(|A|−pA, |B|−pB) ≥ t·|A| prunes before the verify. The
    * eval registry is a fixed sliver ([[TextOps.EvalMod]]), so the
    * prefix side is small by construction and the candidate join keys
    * on its rarest shingles. */
  def containmentJoin(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    containmentJoinOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) =>
          (id, TextOps.shinglesOf(t).distinct)
        })
        .toDF("doc_id", "toks"),
      threshold)
  }

  /** Core containment join over (doc_id, toks) rows; the eval side is
    * the [[TextOps.EvalMod]] registry sliver. Reused by the spec's
    * brute-force equivalence proof. */
  private[graft] def containmentJoinOf(docs0: DataFrame,
      threshold: Double): DataFrame = {
    val docs = docs0.localCheckpoint() // token stream + both verify sides

    val tok = docs.select(col("doc_id"), size(col("toks")).as("m"),
      explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "tok")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))))
      .localCheckpoint() // consumed by the A-prefix and the full B index

    val prefixA = ranked
      .filter(pmod(col("doc_id"), lit(TextOps.EvalMod.toLong)) === 0)
      // downward 1e-9 slack: ⌈t·m⌉ in IEEE doubles can round UP past an
      // exact integer (t=0.1, m=30 → 3.0000000000000004 → ceil 4),
      // silently shortening the prefix and dropping a true pair. The
      // slack only ever LENGTHENS the prefix — over-admitting is safe,
      // the verify stage is exact.
      .filter(col("pos") <=
        col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + 1)
    // Pair-level PPJoin accumulation (the r11 tightening, same lemma as
    // similarityJoinOf's): the distinct() this replaces kept a pair if
    // ANY shared occurrence passed the first-token bound; aggregating
    // the occurrences gives the strictly tighter
    //   |A∩B| ≤ cnt + min(mA − max(pA), mB − max(pB))
    // (cnt shared join tokens all rank ≤ the LAST one w, and every
    // intersection token ranked ≤ rank(w) is itself a join token
    // because positions are rank-monotone within a doc) — same shuffle
    // as the distinct, fewer pairs reach the exact verify.
    val cand = prefixA.as("a")
      .join(ranked.as("b"),
        col("a.tok") === col("b.tok")
          && col("a.doc_id") =!= col("b.doc_id")
          // first-shared-token positional bound, float-safe slack
          && lit(1) + least(col("a.m") - col("a.pos"),
               col("b.m") - col("b.pos"))
             >= lit(threshold) * col("a.m") - lit(1e-9))
      .groupBy(col("a.doc_id").as("eval_id"), col("b.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("cnt"),
        max(col("a.pos")).as("mpa"), max(col("b.pos")).as("mpb"),
        max(col("a.m")).as("cma"), max(col("b.m")).as("cmb"))
      .filter(col("cnt") + least(col("cma") - col("mpa"),
          col("cmb") - col("mpb"))
        >= lit(threshold) * col("cma") - lit(1e-9))
      .select(col("eval_id"), col("doc_id"))

    val sets = docs.select(col("doc_id"),
      sort_array(col("toks")).as("toks"), size(col("toks")).as("m"))
    cand
      .join(sets.select(col("doc_id").as("eval_id"), col("toks").as("ta"),
        col("m").as("ma")), "eval_id")
      .join(sets.select(col("doc_id"), col("toks").as("tb")), "doc_id")
      .withColumn("c",
        graft.functions.SortedIntersectCount
          .sortedIntersectCount(col("ta"), col("tb")).cast("double"))
      .withColumn("containment", col("c") / col("ma"))
      .filter(col("containment") >= threshold)
      .select(col("eval_id"), col("doc_id"),
        Portable.val6(col("containment")).as("containment"))
      .orderBy("eval_id", "doc_id")
  }

  /** Core join over pre-tokenized (doc_id, toks) rows — reused by the
    * spec's brute-force equivalence proof on arbitrary corpora. */
  private[graft] def similarityJoinOf(docs0: DataFrame,
      threshold: Double): DataFrame = {
    // the token sets feed three consumers (the exploded token list and
    // both verify sides) — materialize the shingling once
    val docs = docs0.localCheckpoint()
    val tok = docs.select(col("doc_id"), size(col("toks")).as("m"),
      explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))

    // per-doc rank under the global (df asc, tok asc) rarity order;
    // the set size m rode along from the array, so this is the only
    // window
    val byDoc = Window.partitionBy("doc_id")
    val ranked = tok.join(dfreq, "tok")
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("df"), col("tok"))))

    // prefix length m − ⌈t·m⌉ + 1; ceil() on the Spark side only feeds
    // candidate GENERATION (a longer prefix is merely slower, never
    // wrong), so no cross-engine float contract is needed here — but it
    // still needs the downward 1e-9 slack: t·m can round UP past an
    // exact integer in doubles (t=0.1, m=30 → 3.0000000000000004 →
    // ceil 4), which would SHORTEN the prefix and drop a true pair.
    // Checkpointed: the self-join below consumes it twice.
    val prefix = ranked
      .filter(col("pos") <=
        col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("tok"), col("pos"), col("m"))
      .localCheckpoint()

    // required overlap α for J ≥ t: c ≥ t/(1+t)·(ma+mb). The 1e-9
    // slack keeps the float bound SAFE (never over-prunes a boundary
    // pair); the exact test happens in the verify stage.
    val alphaF = lit(threshold / (1.0 + threshold))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok")
          && col("a.doc_id") < col("b.doc_id")
          // length filter: J ≥ t ⟹ min(ma,mb) ≥ t·max(ma,mb); same
          // downward slack as the positional filter so a boundary pair
          // (J exactly t with t·m rounding up in doubles) never prunes
          && col("a.m") >= lit(threshold) * col("b.m") - lit(1e-9)
          && col("b.m") >= lit(threshold) * col("a.m") - lit(1e-9)
          // positional filter (PPJoin): counting from the pair's FIRST
          // shared token w (which the prefix lemma puts in both
          // prefixes), the overlap is at most 1 + what remains after w
          // on the tighter side — prune occurrences that cannot reach α
          && lit(1) + least(col("a.m") - col("a.pos"),
               col("b.m") - col("b.pos"))
             >= alphaF * (col("a.m") + col("b.m")) - lit(1e-9))
      // pair-level PPJoin accumulation (r11): the occurrence bound above
      // keeps a pair if its FIRST shared prefix token could still reach
      // α; aggregating all shared occurrences tightens that to
      //   |a∩b| ≤ cnt + min(ma − max(pa), mb − max(pb)),
      // valid because (i) the cnt shared prefix tokens all rank ≤ the
      // last one w, (ii) any intersection token ranked ≤ rank(w) has
      // positions ≤ w's on both sides (positions are rank-monotone
      // within a doc), hence sits in both prefixes and is already one
      // of the cnt, and (iii) intersection tokens ranked > rank(w)
      // number at most min(ma − pa(w), mb − pb(w)). Same groupBy
      // shuffle the distinct() paid; strictly fewer pairs pay the
      // exact-verify intersection (guide §2.3/§3.2 — shrink the join
      // input before the expensive stage). No false negatives: the
      // bound over-approximates |a∩b| and keeps the 1e-9 slack.
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("cnt"),
        max(col("a.pos")).as("mpa"), max(col("b.pos")).as("mpb"),
        max(col("a.m")).as("cma"), max(col("b.m")).as("cmb"))
      .filter(col("cnt") + least(col("cma") - col("mpa"),
          col("cmb") - col("mpb"))
        >= alphaF * (col("cma") + col("cmb")) - lit(1e-9))
      .select(col("ida"), col("idb"))

    // exact verify: same arithmetic shape as the oracle —
    // c / (ma + mb − c) in doubles, 6-decimal portable rounding. The
    // overlap count runs through the codegen'd merge-walk kernel
    // (functions/SortedIntersectCount) over sort_array'd sets — Spark's
    // sort_array uses the same UTF8 byte order the kernel compares by
    val sets = docs.select(col("doc_id"),
      sort_array(col("toks")).as("toks"), size(col("toks")).as("m"))
    cand
      .join(sets.select(col("doc_id").as("ida"), col("toks").as("ta"),
        col("m").as("ma")), "ida")
      .join(sets.select(col("doc_id").as("idb"), col("toks").as("tb"),
        col("m").as("mb")), "idb")
      .withColumn("c",
        graft.functions.SortedIntersectCount
          .sortedIntersectCount(col("ta"), col("tb")).cast("double"))
      .withColumn("jaccard",
        col("c") / ((col("ma") + col("mb")).cast("double") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"),
        Portable.val6(col("jaccard")).as("jaccard"))
      .orderBy("ida", "idb")
  }
}
