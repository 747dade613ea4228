package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable

/** Supervised-ML feature-engineering operators — the tabular side of a
  * training-data pipeline (the text/embedding side lives in TextOps /
  * VectorOps). Both operators here are leakage-prevention shapes: the
  * statistic a model trains on must never be computed FROM the row it
  * is applied to (target encoding) or from the future (temporal
  * splits).
  */
object Features {

  /** q202 — out-of-fold (OOF) target encoding with additive smoothing.
    *
    * Target encoding replaces a categorical column with the mean of the
    * target within the category — but the naive version leaks the row's
    * own label into its feature. The standard fix is K-fold OOF: the
    * encoding applied to fold f is computed from every fold EXCEPT f,
    * plus additive smoothing toward a prior so rare categories don't
    * memorize noise; the prior itself is the fold-excluded GLOBAL mean,
    * for the same leakage reason.
    *
    * Encoding table at (category, fold) grain:
    *   oof_mean(c,f) = mean(target | category=c, fold≠f)
    *   enc(c,f)      = (sum_oof(c,f) + m·prior(f)) / (n_oof(c,f) + m)
    * with m = [[SmoothM]] and fold = o_orderkey mod K (deterministic —
    * reproducible across engines and runs, unlike a random fold draw).
    *
    * Scale: ONE corpus-sized aggregation — groupBy (category, fold)
    * with map-side combine reduces 100 TB of facts to |C|·K rows before
    * any further step; the complements (category totals, fold totals,
    * grand total) are all re-aggregations of that tiny grain, joined
    * back broadcast. Money runs on exact integer cents
    * ([[Portable.cents2]]) so fold subtraction is exact, not a float
    * cancellation.
    */
  def targetEncodeOof(spark: SparkSession, dir: String,
      folds: Int = 5): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        pmod(col("o_orderkey"), lit(folds)).cast("int").as("fold"),
        Portable.cents2(col("o_totalprice")).as("cents"))

    // the single corpus-sized reduce: (segment, fold) grain
    val g = base.groupBy("segment", "fold")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))

    val segTot = g.groupBy("segment")
      .agg(sum("n").as("seg_n"), sum("s").as("seg_s"))
    val foldTot = g.groupBy("fold")
      .agg(sum("n").as("fold_n"), sum("s").as("fold_s"))
    val grand = g.agg(sum("n").as("g_n"), sum("s").as("g_s"))

    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    g.join(segTot, "segment")
      .join(foldTot, "fold")
      .crossJoin(broadcast(grand))
      .withColumn("oof_n", col("seg_n") - col("n"))
      .withColumn("oof_s", col("seg_s") - col("s"))
      // fold-excluded global prior (per fold, exact cents → one division)
      .withColumn("prior",
        dbl(col("g_s") - col("fold_s")) / lit(100.0)
          / dbl(col("g_n") - col("fold_n")))
      .withColumn("oof_mean",
        dbl(col("oof_s")) / lit(100.0) / dbl(col("oof_n")))
      .withColumn("enc",
        (dbl(col("oof_s")) / lit(100.0) + lit(SmoothM) * col("prior"))
          / (dbl(col("oof_n")) + lit(SmoothM)))
      .select(col("segment"), col("fold"), col("oof_n"),
        Portable.val6(col("oof_mean")).as("oof_mean"),
        Portable.val6(col("enc")).as("enc"))
      .orderBy("segment", "fold")
  }

  /** Smoothing pseudo-count for [[targetEncodeOof]]. */
  val SmoothM = 20.0

  /** q205 — purged temporal train/val/test split with an embargo.
    *
    * A temporal split alone still leaks when features are windowed: a
    * training row just before the boundary carries aggregates that
    * overlap the validation period. The purge drops an [[EmbargoDays]]
    * window BEFORE each boundary (de Prado's purged K-fold, applied to
    * a single chronological split). Boundaries sit at fixed fractions
    * of the observed date range — deterministic given the data, no
    * clock dependence:
    *
    *   b1 = d_min + ⌊0.70·span⌋ days,  b2 = d_min + ⌊0.85·span⌋ days
    *   train  = [d_min, b1 − E)     purged = [b1−E, b1) ∪ [b2−E, b2)
    *   val    = [b1, b2 − E)        test   = [b2, d_max]
    *
    * Scale: the bounds are a metadata-sized global min/max aggregate
    * (one partial-merged reduce), broadcast back onto the scan as a
    * 1-row cross join — the corpus-sized pass is a single map-stage
    * CASE over the date column feeding a low-cardinality aggregation.
    * No sort, no window, no repartition.
    */
  def purgedTemporalSplit(spark: SparkSession, dir: String,
      embargoDays: Int = EmbargoDays): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_custkey"),
        Portable.cents2(col("o_totalprice")).as("cents"))
    val bounds = o.agg(min("day").as("d_min"), max("day").as("d_max"))

    o.crossJoin(broadcast(bounds))
      .withColumn("span", datediff(col("d_max"), col("d_min")))
      .withColumn("b1",
        date_add(col("d_min"), floor(lit(0.70) * col("span")).cast("int")))
      .withColumn("b2",
        date_add(col("d_min"), floor(lit(0.85) * col("span")).cast("int")))
      .withColumn("split",
        when(col("day") < date_sub(col("b1"), embargoDays), "1_train")
          .when(col("day") < col("b1"), "4_purged")
          .when(col("day") < date_sub(col("b2"), embargoDays), "2_val")
          .when(col("day") < col("b2"), "4_purged")
          .otherwise("3_test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        (sum(col("cents")).cast("double") / lit(100.0)).as("revenue"),
        min(col("day")).as("d_from"),
        max(col("day")).as("d_to"))
      .orderBy("split")
  }

  val EmbargoDays = 7

  /** q221 — WOE / IV feature screening (weight of evidence +
    * information value — the credit-scoring-lineage filter for "which
    * features separate the classes at all", run before any model):
    * against the binary return outcome (l_returnflag = 'R'), each
    * candidate feature is binned and scored
    *   WOE_b = ln((g_b/G)/(b_b/B)) = ln(g_b·B / (b_b·G)),
    *   IV    = Σ_b (g_b/G − b_b/B) · WOE_b,
    * IV < 0.02 ⟹ the feature is noise; ≥ 0.1 ⟹ worth a model's time.
    *
    * Exactness: the WOE argument is a ratio of exact integer products,
    * so ONE ln per bin, micro-floor-scaled; the IV numerator
    * Σ (g_b·B − b_b·G)·woe6 accumulates as exact longs and divides out
    * once — no float crosses a row boundary. Scale: one stacked
    * (feature, bin) reduce over the fact scan (map-side combined,
    * |features|·|bins| grain), everything after is metadata. */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val feats = li.select(
        explode(array(
          struct(lit("quantity").as("feature"),
            floor((col("l_quantity") - 1) / lit(10.0)).cast("long")
              .as("bin")),
          struct(lit("discount").as("feature"),
            floor(col("l_discount") * lit(50.0)).cast("long").as("bin")),
          struct(lit("price").as("feature"),
            least(floor(col("l_extendedprice") / lit(20000.0)), lit(4.0))
              .cast("long").as("bin")))).as("f"),
        (col("l_returnflag") === "R").as("is_bad"))
      .select(col("f.feature").as("feature"), col("f.bin").as("bin"),
        col("is_bad"))
    val g = feats.groupBy("feature", "bin")
      .agg(sum(when(col("is_bad"), 0L).otherwise(1L)).as("g"),
        sum(when(col("is_bad"), 1L).otherwise(0L)).as("b"))
    val row = li.agg(
      sum(when(col("l_returnflag") === "R", 0L).otherwise(1L)),
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))).collect()(0)
    val (gTot, bTot) = (row.getLong(0), row.getLong(1))
    val woe6 = floor(
      log((col("g") * lit(bTot)).cast("double")
        / (col("b") * lit(gTot)).cast("double"))
        * lit(1000000.0) + lit(0.5)).cast("long")
    // single-class bins have undefined WOE — dropped on both sides
    // (standard practice is merging them; none exist at gate SFs)
    val scored = g.filter(col("g") > 0 && col("b") > 0)
      .withColumn("woe6", woe6)
      .withColumn("num", (col("g") * lit(bTot) - col("b") * lit(gTot))
        * col("woe6"))
    val iv = scored.groupBy("feature").agg(sum("num").as("ivnum"))
      .withColumn("iv", Portable.val6(col("ivnum").cast("double")
        / lit(gTot.toDouble * bTot.toDouble) / lit(1000000.0)))
      .select("feature", "iv")
    scored.join(iv, "feature")
      .select(col("feature"), col("bin"), (col("g") + col("b")).as("n"),
        col("b").as("n_bad"),
        Portable.val6(col("woe6").cast("double") / lit(1000000.0))
          .as("woe"),
        col("iv"))
      .orderBy("feature", "bin")
  }

  /** q222 — pairwise mutual information between categorical features:
    * the REDUNDANCY complement of q221's target screening (two
    * features can both carry high IV yet say the same thing — MI
    * between them reveals it before a model wastes capacity). For each
    * feature pair, MI = Σ_cells p(x,y)·ln(N·c_xy / (c_x·c_y)) — the
    * ln argument is exact integers, so one ln per CELL nano-scales and
    * the cross-cell sum is exact longs.
    *
    * Scale: one stacked (pair, x, y) reduce with map-side combine;
    * marginals re-aggregate the cell grain; everything after is
    * cells-sized metadata. */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val qbin = floor((col("l_quantity") - 1) / lit(10.0)).cast("long")
      .cast("string")
    val stacked = li.select(explode(array(
        struct(lit("returnflag~linestatus").as("pair"),
          col("l_returnflag").as("x"), col("l_linestatus").as("y")),
        struct(lit("returnflag~qbin").as("pair"),
          col("l_returnflag").as("x"), qbin.as("y")),
        struct(lit("linestatus~qbin").as("pair"),
          col("l_linestatus").as("x"), qbin.as("y")))).as("f"))
      .select(col("f.pair").as("pair"), col("f.x").as("x"),
        col("f.y").as("y"))
    val cells = stacked.groupBy("pair", "x", "y")
      .agg(count(lit(1)).as("cxy"))
      .localCheckpoint() // marginals ×2 + the term pass
    val mx = cells.groupBy("pair", "x").agg(sum("cxy").as("cx"))
    val my = cells.groupBy("pair", "y").agg(sum("cxy").as("cy"))
    val n = li.count()
    val term9 = floor(
      col("cxy").cast("double")
        * log((col("cxy") * lit(n)).cast("double")
          / (col("cx") * col("cy")).cast("double"))
        * lit(1000000000.0) + lit(0.5)).cast("long")
    cells.join(mx, Seq("pair", "x")).join(my, Seq("pair", "y"))
      .withColumn("t9", term9)
      .groupBy("pair")
      .agg(count(lit(1)).as("n_cells"), sum("t9").as("s9"))
      .select(col("pair"), col("n_cells"),
        Portable.val6(col("s9").cast("double") / lit(1000000000.0)
          / lit(n.toDouble)).as("mi_nats"))
      .orderBy("pair")
  }

  /** q223 — Benford first-digit audit: the classic
    * fabricated-numbers / unit-mix data-quality test. Money amounts
    * spanning orders of magnitude follow log10(1+1/d) first-digit
    * frequencies; a corpus whose digits deviate hard was truncated,
    * synthesized, or mixed across units. Reports per-digit observed vs
    * expected shares and each digit's χ² contribution.
    *
    * Portability: the first digit comes from the INTEGER STRING of
    * ⌊price⌋ (no log10 on data); the nine expected shares are Scala
    * doubles embedded as literals in both plans, so every float is a
    * per-digit expression over exact counts. One digit-grain reduce. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val n = Tables.orders(spark, dir).count()
    val expect = BenfordP.zipWithIndex
      .map { case (p, i) => (i + 1, p) }
      .foldLeft(lit(0.0)) { case (acc, (d, p)) =>
        when(col("digit") === d, lit(p)).otherwise(acc)
      }
    digits
      .withColumn("p", expect)
      .select(col("digit"), col("n_obs"),
        Portable.val6(col("n_obs").cast("double") / lit(n.toDouble))
          .as("obs_share"),
        Portable.val6(col("p")).as("benford_p"),
        Portable.val6(
          (col("n_obs").cast("double") - lit(n.toDouble) * col("p"))
            * (col("n_obs").cast("double") - lit(n.toDouble) * col("p"))
            / (lit(n.toDouble) * col("p"))).as("chi2_part"))
      .orderBy("digit")
  }

  /** log10(1 + 1/d) for d = 1..9 — shared verbatim with the oracle. */
  val BenfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** q208 — k-anonymity audit over quasi-identifiers (Sweeney's
    * re-identification model — public literature): a table is
    * k-anonymous when every combination of quasi-identifier values
    * (here nation × market segment × balance bracket) is shared by at
    * least k rows; rows in smaller groups are re-identifiable and a
    * release policy must suppress or generalize them. The card reports
    * the achieved k, the suppression volume at the policy threshold,
    * and the group-size shape — the privacy gate a training-data
    * release runs next to the PII redaction pass (q137).
    *
    * Scale: ONE map-side-combined aggregation reduces the corpus to
    * QI-group grain; every reported statistic re-aggregates that grain
    * to a single row. No joins, no windows, no sort.
    */
  def kAnonymity(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val qi = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"))
    val g = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
      .agg(count(lit(1)).as("n"))
    g.agg(
        sum("n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        min("n").as("k_anonymity"),
        sum(when(col("n") < k, col("n")).otherwise(lit(0L)))
          .as("n_rows_below_k"),
        sum(when(col("n") < k, 1L).otherwise(lit(0L)))
          .as("n_groups_below_k"))
      .select(col("n_rows"), col("n_groups"), col("k_anonymity"),
        col("n_rows_below_k"), col("n_groups_below_k"),
        Portable.val6(col("n_rows_below_k").cast("double")
          / col("n_rows").cast("double")).as("suppression_rate"),
        Portable.val6(col("n_rows").cast("double")
          / col("n_groups").cast("double")).as("avg_group_size"))
  }

  /** q321's student features: cheap SCAN-LOCAL length proxies — every
    * test an exact integer comparison, so the design matrix is
    * bit-identical on both engines. Deliberately disjoint from the
    * teacher's signal (full-vocabulary distinctness): the student can
    * only learn the correlation, not read the answer. */
  private[graft] val LogRegFeatures: Seq[(String, org.apache.spark.sql.Column)] = {
    val nTok = size(split(col("text"), " "))
    Seq(
      "bias" -> lit(true),
      "tok_lt_30" -> (nTok < 30),
      "tok_lt_45" -> (nTok < 45),
      "tok_lt_60" -> (nTok < 60),
      "tok_lt_80" -> (nTok < 80),
      "tok_lt_100" -> (nTok < 100),
      "chars_lt_300" -> (col("n_chars") < 300),
      "chars_lt_600" -> (col("n_chars") < 600))
  }

  /** q321 — LOGISTIC REGRESSION trained in-engine: the classifier rung
    * that completes the classical-ML quartet next to OLS (q102), PCA
    * (q185), and k-means (q76), in the shape every curation stack
    * actually uses it — DISTILL an expensive gate into a cheap one.
    * Teacher label: the lexical-diversity rule TTR > 0.55 (exact
    * integers: 20·n_types > 11·n_tokens — needs the full per-doc
    * vocabulary). Student: eight scan-local length thresholds. The
    * trained student reproduces the teacher at ~90 % on held-in data
    * for a fraction of the cost — the model card carries the measured
    * agreement.
    *
    * Training is 5 full-batch gradient steps with EXACT arithmetic at
    * every cross-row boundary (the q102/q308 discipline): weights are
    * nano-scaled integers, so each doc's logit z9 is an integer SUM of
    * the active features' weights; the per-doc residual (σ̃(z) − y)
    * nano-floors through ONE fixed IEEE tree; gradients are integer
    * sums of those residuals; and the update w ← w − trunc(g/n) uses
    * truncating integer division on BOTH engines (JVM `/` on longs ≡
    * DuckDB `//` — measured: DuckDB's `//` truncates toward zero on
    * negatives, it does NOT floor). The squashing link is the
    * ALGEBRAIC fast sigmoid
    * σ̃(z) = ½ + z/(2(1+|z|)) — same shape, same fixed point, but every
    * op is correctly-rounded IEEE, so the 5-step feedback loop needs
    * NO transcendental agreement between engines (measured: DuckDB's
    * vectorized exp() is ~1e-12 off glibc/JVM — harmless once, fatal
    * iterated through integer floors; the q263 determinism discipline
    * extended to model TRAINING). The oracle replays all five steps as
    * an UNROLLED CTE chain generated from the same feature/step lists.
    *
    * Scale: the design matrix is one scan (features are scan-local);
    * each step is one map-side-combined 8-sum aggregate against
    * broadcast 1-row weights — 5·O(n/p) with 8 longs of driver state
    * (the k-means q76 shape). Emits per-feature weights plus the
    * training accuracy/size the model card needs. */
  def logisticQualityDistill(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame = {
    import spark.implicits._
    val feats = LogRegFeatures
    val (x, w9, n) = trainDistill(spark, dir, steps)
    val acc = x.select(
      sum(when((z9Col(w9) > 0).cast("int") === col("y"), 1L)
        .otherwise(0L)).as("correct")).collect()(0).getLong(0)
    val wDf = feats.zipWithIndex.map { case ((name, _), i) =>
      (i, name, w9(i)) }.toDF("feature_idx", "feature", "w9")
    wDf.select(col("feature_idx"), col("feature"), col("w9"),
        (col("w9").cast("double") / lit(1.0e9)).as("weight"))
      .withColumn("train_n", lit(n))
      .withColumn("train_acc",
        Portable.val6(lit(acc.toDouble) / lit(n.toDouble)))
      .orderBy("feature_idx")
  }

  /** The q321/q322 training core: design matrix + 5 exact gradient
    * steps; returns (design frame, final nano-weights, n). */
  private def trainDistill(spark: SparkSession, dir: String,
      steps: Int): (DataFrame, Array[Long], Long) = {
    val feats = LogRegFeatures
    val k = feats.size
    val teacher =
      (size(array_distinct(split(col("text"), " "))) * 20
        > size(split(col("text"), " ")) * 11)
    val x = Tables.documents(spark, dir)
      .select(teacher.cast("int").as("y") +:
        feats.zipWithIndex.map { case ((_, c), i) =>
          c.cast("int").as(s"x$i") }: _*)
      .localCheckpoint() // the design matrix: scanned once per step
    val n = x.count()
    var w9 = Array.fill(k)(0L)
    for (_ <- 1 to steps) {
      val g = x.withColumn("d9", d9Col(w9))
        .agg(sum(col("x0") * col("d9")).as("g0"),
          feats.indices.tail.map(i =>
            sum(col(s"x$i") * col("d9")).as(s"g$i")): _*)
        .collect()(0)
      // JVM long division truncates toward zero — same as DuckDB `//`
      w9 = feats.indices.map(i => w9(i) - g.getLong(i) / n).toArray
    }
    (x, w9, n)
  }

  private def z9Col(w9: Array[Long]): org.apache.spark.sql.Column =
    LogRegFeatures.indices
      .map(i => col(s"x$i") * lit(w9(i))).reduce(_ + _)

  /** The fast-sigmoid probability tree over integer weights. */
  private def pCol(w9: Array[Long]): org.apache.spark.sql.Column = {
    val zD = z9Col(w9).cast("double") / lit(1.0e9)
    lit(0.5) + zD / (lit(2.0) * (lit(1.0) + abs(zD)))
  }

  private def d9Col(w9: Array[Long]): org.apache.spark.sql.Column =
    floor((pCol(w9) - col("y").cast("double")) * lit(1.0e9) + lit(0.5))
      .cast("long")

  /** q322 — CALIBRATION card for the q321 distilled classifier: the
    * reliability diagram (10 confidence bins: per bin n, mean
    * predicted probability, realized rate, |gap|) plus ECE and the
    * Brier score — the numbers that say whether the student's
    * probabilities MEAN anything, which a deployment thresholds on.
    * The q186/q197 evaluation discipline (recall audits for ANN,
    * MRR/nDCG for retrieval) extended to the trained classifier.
    *
    * Exactness: per-doc probability and squared error nano-floor
    * through fixed trees (the q321 link — algebraic, no
    * transcendentals); bin aggregates are integer sums; ECE/Brier are
    * single fixed trees over those exact integers.
    *
    * Scale: training is q321's 5·O(n/p); the card is ONE more
    * map-side-combined pass to the 10-bin grain. */
  def distillCalibration(spark: SparkSession, dir: String,
      steps: Int = 5): DataFrame = {
    val (x, w9, n) = trainDistill(spark, dir, steps)
    val p = pCol(w9)
    val p9 = floor(p * lit(1.0e9) + lit(0.5)).cast("long")
    val bucket = least(floor(p * lit(10.0)).cast("int"), lit(9))
    val sq = (p - col("y").cast("double"))
    val sq9 = floor(sq * sq * lit(1.0e9) + lit(0.5)).cast("long")
    val bins = x.select(bucket.as("bin"), p9.as("p9"),
        col("y").cast("long").as("y"), sq9.as("sq9"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("p9").as("sp9"),
        sum("y").as("k"), sum("sq9").as("ssq9"))
    val conf = col("sp9").cast("double") / col("n").cast("double") /
      lit(1.0e9)
    val acc = col("k").cast("double") / col("n").cast("double")
    val gap9 = floor(abs(acc - conf) * lit(1.0e9) + lit(0.5))
      .cast("long")
    val scored = bins.withColumn("c9", gap9 * col("n"))
    val tot = scored.agg(sum("c9").as("tc9"), sum("ssq9").as("tsq9"))
    scored.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        Portable.val6(conf).as("confidence"),
        Portable.val6(acc).as("realized"),
        Portable.val6(abs(acc - conf)).as("gap"),
        Portable.val6(col("tc9").cast("double") / lit(n.toDouble)
          / lit(1.0e9)).as("ece"),
        Portable.val6(col("tsq9").cast("double") / lit(n.toDouble)
          / lit(1.0e9)).as("brier"))
      .orderBy("bin")
  }

  /** q329 — MULTINOMIAL NAIVE BAYES trained in-engine, distilling the
    * same lexical-diversity teacher as q321 (TTR > 0.55, exact-integer
    * form 20·n_types > 11·n_tokens) — but where q321's student sees
    * eight scan-local thresholds, this student sees the TOKENS: the
    * generative text classifier every curation stack ships first
    * (fastText's ancestor), trained in ONE aggregation pass with no
    * iteration at all.
    *
    * Model: class priors nd_c/nd; Laplace-1 token likelihoods
    * (cnt_tc + 1)/(tok_c + V). Prediction for a doc is the sign of the
    * integer score z9 = prior9 + Σ_t tf · llr9(t), where llr9(t) is the
    * per-term log-likelihood-ratio nano-floored through ONE fixed IEEE
    * tree (the q182/q308 discipline: `ln` appears exactly once per
    * term, never inside an iterated feedback loop, so engines agree on
    * the floored integer) and prior9 = ⌊ln(nd₁/nd₀)·1e9⌉. Ties (z9 = 0)
    * break to class 0 — stated, not incidental.
    *
    * Output: the DENSE 2×2 confusion grid (teacher y × student ŷ, the
    * q275 chi-square dense-grid discipline so a vanished cell cannot
    * change the row count) with per-cell fractions, plus the model-card
    * scalars every row carries: train accuracy, vocabulary size, doc
    * counts, and the two priors.
    *
    * Scale: training IS one groupBy over the (t, y) token stream
    * (vocab-grain result — Heaps-sublinear, the q206 argument);
    * scoring joins the per-doc tf stream to the vocab-grain llr table
    * on t (shuffle join — the vocab outgrows a broadcast at corpus
    * scale) and reduces per doc: two shuffles total, both map-side
    * combined, no driver state beyond four scalars. The oracle replays
    * the identical arithmetic as CTEs (same split semantics, same
    * floors, same tie-break). */
  def naiveBayesDistill(spark: SparkSession, dir: String): DataFrame =
    naiveBayesDistillOn(spark, Tables.documents(spark, dir))

  /** q329 core on any (doc_id, text) frame — the fixture corpus's
    * 31-token vocabulary makes the TTR teacher genuinely unlearnable
    * from token counts (train_acc ≈ 0.64 < majority — an honest
    * negative the card REPORTS); Round14Spec pins perfect separation
    * on a corpus whose classes have disjoint vocabularies. */
  private[graft] def naiveBayesDistillOn(spark: SparkSession,
      corpus: DataFrame): DataFrame = {
    val teacher =
      (size(array_distinct(split(col("text"), " "))) * 20
        > size(split(col("text"), " ")) * 11)
    val docs = corpus
      .select(col("doc_id"), col("text"), teacher.cast("int").as("y"))
    val tf = docs
      .select(col("doc_id"), col("y"),
        explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "y", "t").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // consumed by train AND score
    // class-conditional token counts: vocab-grain (t × 2 classes)
    val cls = tf.groupBy("t")
      .agg(sum(when(col("y") === 1, col("tf")).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0, col("tf")).otherwise(0L)).as("c0"))
      .localCheckpoint()
    val tot = cls.agg(sum("c1").as("tok1"), sum("c0").as("tok0"),
        count(lit(1)).as("v")).collect()(0)
    val (tok1, tok0, v) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val nds = docs.groupBy("y").agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (nd0, nd1) = (nds.getOrElse(0, 0L), nds.getOrElse(1, 0L))
    require(nd0 > 0 && nd1 > 0, "degenerate teacher: one class is empty")
    // per-term LLR, nano-floored once: ln((c1+1)/(tok1+V)) − ln((c0+1)/(tok0+V))
    val llr9 = floor((log((col("c1").cast("double") + lit(1.0))
        / lit((tok1 + v).toDouble))
      - log((col("c0").cast("double") + lit(1.0))
        / lit((tok0 + v).toDouble))) * lit(1.0e9) + lit(0.5))
      .cast("long")
    val prior9 = math.floor(
      math.log(nd1.toDouble / nd0.toDouble) * 1.0e9 + 0.5).toLong
    val z = tf.join(cls.select(col("t"), llr9.as("llr9")), "t")
      .groupBy("doc_id", "y")
      .agg((sum(col("tf") * col("llr9")) + lit(prior9)).as("z9"))
      .select(col("y"), (col("z9") > 0).cast("int").as("yhat"))
    // The confusion cells are a ≤4-row aggregate final — collect them
    // (metadata grain, same class as `tot`/`nds` above) and assemble
    // the dense 2×2 grid driver-side as literals. The alternative —
    // crossJoining an in-plan 1-row accuracy aggregate into the grid —
    // plans a BroadcastNestedLoopJoin + SinglePartition exchange that
    // PlanAuditSpec would have to sanction; bounded either way, but
    // four literal rows need no plan at all. All distributed work
    // (tf → cls → z → cells) happens in the one action below.
    val cellMap = z.groupBy("y", "yhat").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val n = nd0 + nd1
    val nCorrect = cellMap.getOrElse((0, 0), 0L) +
      cellMap.getOrElse((1, 1), 0L)
    // driver-side mirror of Portable.val6 (floor(x·1e6 + 0.5) / 1e6)
    def v6(x: Double): Double =
      math.floor(x * 1.0e6 + 0.5).toLong.toDouble / 1.0e6
    val trainAcc = v6(nCorrect.toDouble / n.toDouble)
    val prior1 = v6(nd1.toDouble / n.toDouble)
    // dense 2×2 grid: a vanished cell must not change the row count
    val rows = for { y <- 0 to 1; yhat <- 0 to 1 } yield {
      val nDocs = cellMap.getOrElse((y, yhat), 0L)
      (y, yhat, nDocs, v6(nDocs.toDouble / n.toDouble),
        trainAcc, v, nd0, nd1, prior1)
    }
    import spark.implicits._
    rows.toDF("y", "yhat", "n_docs", "frac", "train_acc",
      "vocab", "nd0", "nd1", "prior1")
  }
}
