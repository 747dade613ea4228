package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable._

/** Customer-behavior analytics the reference's dashboard family implies
  * (app.py's KPI/funnel/segment views) but never ships: cohort
  * retention, RFM segmentation, market-basket co-occurrence, and
  * campaign-window attribution. Each is shaped for the 100 TB posture:
  * aggregate-to-grain first, window over the reduced grain, broadcast
  * the small side, and keep range predicates as residuals on equi-joins.
  */
object Analytics {

  /** Upper bound on per-basket distinct items before pair fan-out
    * (brandPairs here, brandPageRank/brandReach edge derivation in
    * [[Graphs]]). A basket of width w explodes into ≤ w² in-row pairs;
    * the cap makes that provably constant per order — linear overall —
    * instead of quadratic in the widest basket. 32 > the entire TPC-H
    * brand vocabulary (25), so the slice never binds on TESTDATA and
    * every oracle hash is unchanged; at 100 TB it is the guard that
    * keeps one pathological mega-order from dominating a stage. */
  val MaxBasketWidth = 32

  /** Cohort retention matrix over `events`: users bucketed by first-seen
    * WEEK (the table spans ~30 days), then counted distinct per
    * (cohort week, weeks since). Both engines truncate weeks to Monday,
    * and weeks-since is an exact day-difference divided by 7 — integer
    * arithmetic, engine-portable (unlike months_between's fractional
    * double).
    *
    * Scale shape: the per-user min reduces the fact table in one
    * map-side-combined shuffle to user grain; activity weeks are a
    * second distinct at (user, week) grain; the join back is user⋈user
    * (co-partitioned by the same key, so AQE plans it shuffle-free off
    * the first aggregation's exchange). Nothing here is
    * cardinality-fragile: the output is |cohorts| × |weeks|. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id")
      .agg(min("day").as("first_day"))
      .select(col("user_id"), trunc(col("first_day"), "week").as("cohort_week"))
    val active = e.select(col("user_id"), trunc(col("day"), "week").as("w"))
      .distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("weeks_since"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** RFM segmentation at customer grain: recency (days from last order
    * to the dataset's max order date), frequency (order count), monetary
    * (exact cents). Quartile scores via ntile(4) with the key as
    * tiebreak so tied metric values rank deterministically.
    *
    * The input is the reduced customer grain (|customers| rows after a
    * single aggregation of orders), and the three quartile scores are
    * exact at ANY grain: each comes from a two-phase range-partitioned
    * global rank + closed-form NTILE arithmetic, never a
    * single-partition window sort (PlanAuditSpec pins the absence). */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), to_date(col("o_orderdate")).as("day"),
      col("o_totalprice"))
    val anchor = o.agg(max("day").as("anchor"))
    val grain = o.groupBy("o_custkey")
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(cents2(col("o_totalprice"))).as("cents"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_day")).as("recency_days"),
        col("frequency"), col("cents"))
    // Three global quartile assignments WITHOUT a single-partition
    // sort: chain three two-phase range-partitioned ranks (R, then F,
    // then M — each pass re-range-partitions on its own total key,
    // carrying the earlier ranks along, so no join-back is needed) and
    // derive each score with the closed-form NTILE arithmetic
    // ([[Relational.ntileFromRank]]) — bit-identical to the three
    // ntile(4) windows this replaced, with every stage fully parallel.
    val n = grain.count()
    val r1 = Relational.rankedBy(grain,
      struct(col("recency_days").as("rd"), col("o_custkey").as("ck")), "_rr")
    val r2 = Relational.rankedBy(r1,
      struct((-col("frequency")).as("nf"), col("o_custkey").as("ck")), "_rf")
    val r3 = Relational.rankedBy(r2,
      struct((-col("cents")).as("nm"), col("o_custkey").as("ck")), "_rm")
    r3.select(col("o_custkey"), col("recency_days"), col("frequency"),
        (col("cents").cast("double") / 100.0).as("monetary"),
        Relational.ntileFromRank(col("_rr"), n, 4).cast("int").as("r_score"),
        Relational.ntileFromRank(col("_rf"), n, 4).cast("int").as("f_score"),
        Relational.ntileFromRank(col("_rm"), n, 4).cast("int").as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  /** Market-basket co-occurrence: brand pairs bought together in one
    * order, with support counts — the apriori first pass every
    * recommender bootstrap runs. The part dim is broadcast so the fact
    * table never reshuffles for the enrichment.
    *
    * NOT a self-join: baskets collapse to one brand-set row per order
    * (`collect_set`, partial-merged map-side like any agg), and the
    * pairs explode IN-ROW from the set via two generators with the
    * `a < b` ordering filter. One shuffle on the order key replaces the
    * self-join's two join-input shuffles + join; the blow-up stays
    * bounded at basket-size² per row. Measured 3× faster than the
    * equivalent distinct+self-join plan at sf0.1.
    *
    * Skew note for 100 TB: ubiquitous brands make popular pairs heavy in
    * the AGGREGATION (handled by partial aggregation) — the in-row
    * explosion is per-order and cannot skew. The fan-out is additionally
    * BOUNDED: baskets are sliced to [[MaxBasketWidth]] distinct brands
    * (sorted first, so the truncation is deterministic), making the
    * explosion provably ≤ width² per order regardless of input shape —
    * a pathological mega-basket can no longer go quadratic. The cap
    * sits above TPC-H's whole 25-brand vocabulary, so on TESTDATA it
    * never binds and oracle hashes are unchanged (SCALE.md). */
  def brandPairs(spark: SparkSession, dir: String, minSupport: Long = 8): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("p_brand"))), 1, MaxBasketWidth)
        .as("brands"))
    baskets
      .select(explode(col("brands")).as("brand_a"), col("brands"))
      .select(col("brand_a"), explode(col("brands")).as("brand_b"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy("brand_a", "brand_b")
  }

  /** Skew-mitigated JOIN by salting — the join-side twin of q59's
    * salted aggregation. The events fact has 5 join-key values
    * (event_type), the canonical pathological join skew: a plain
    * shuffled join funnels the whole fact through 5 reducers. Salting
    * REPLICATES the small side across `salt` shards (5 rows → 5×salt)
    * and scatters the fact by a salt derived from a high-cardinality
    * column; the join key becomes (event_type, salt), spreading each hot
    * key over `salt` reducers. The salt never escapes: the aggregate is
    * keyed on the original column, and the oracle is the PLAIN join —
    * proving the rewrite exact, as with q59.
    *
    * The shuffle_hash hint models the big-big case where the dim does
    * NOT fit in a broadcast (when it does, broadcast IS the skew fix).
    * AQE's skew-join handles sort-merge spills adaptively; explicit
    * salting is the shape that also works for stateful/streaming joins
    * where AQE cannot re-plan. */
  def saltedWeightedValue(spark: SparkSession, dir: String, salt: Int = 16): DataFrame = {
    import spark.implicits._
    val weights = Seq(("view", 1.0), ("click", 2.0), ("signup", 5.0),
      ("purchase", 10.0), ("error", 0.5)).toDF("event_type", "weight")
    val dim = weights.crossJoin(
      spark.range(salt).select(col("id").cast("int").as("__salt")))
    val fact = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("__salt", pmod(col("event_id"), lit(salt)).cast("int"))
    fact.join(dim.hint("shuffle_hash"), Seq("event_type", "__salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sumMoney2(col("value") * col("weight")).as("weighted_value"))
      .orderBy("event_type")
  }

  /** Campaign-window attribution — a POINT-IN-INTERVAL range join.
    * Campaign windows are derived deterministically from the event-time
    * extent: 10 overlapping 14-day campaigns starting every 7 days, so
    * each event can attribute to 0–2 campaigns.
    *
    * Spark-first scale shape: a naive `start <= ts < end` join is a
    * nested loop. Here both sides are BINNED to 7-day buckets — a
    * campaign spans ⌈14/7⌉+1 bins, an event has exactly one bin — and
    * the join becomes an EQUI-join on the bin with the range predicate
    * as a residual. Equi-joins hash-partition, so this survives a
    * big-big range join (interval dim too large to broadcast) without a
    * cartesian; with the 10-row campaign dim it degenerates to a cheap
    * broadcast either way. The bin width must be ≥ the max interval
    * width divided into its covering bins; 7 days ≡ the campaign grid. */
  def campaignAttribution(spark: SparkSession, dir: String): DataFrame = {
    val binDays = 7L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
    val ext = e.agg(min("day").as("lo")).select(col("lo"))
    val campaigns = ext.select(explode(sequence(lit(0), lit(9))).as("campaign_id"),
        col("lo"))
      .select(col("campaign_id"),
        date_add(col("lo"), (col("campaign_id") * 7).cast("int")).as("start_day"),
        date_add(col("lo"), (col("campaign_id") * 7 + 14).cast("int")).as("end_day"))
    // bin each campaign into every 7-day bucket it covers, keyed off the
    // same epoch so event bins and campaign bins align
    val binned = campaigns
      .withColumn("bin", explode(sequence(
        floor(unix_date(col("start_day")) / binDays),
        floor((unix_date(col("end_day")) - 1) / binDays))))
    val eb = e.withColumn("bin", floor(unix_date(col("day")) / binDays))
    eb.join(broadcast(binned), Seq("bin"))
      .filter(col("start_day") <= col("day") && col("day") < col("end_day"))
      .groupBy("campaign_id", "start_day", "end_day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("campaign_id")
  }

  /** Time-to-convert distribution per acquisition cohort (SURVEY §8.10
    * analytics family): first-view → first-purchase latency, rolled to
    * the first-view day. One aggregation collapses events to per-user
    * firsts (conditional min — map-side combinable, the shuffle
    * carries two timestamps per user), a second rolls user latencies
    * into cohort quantiles. Gaps stay exact integer microseconds until
    * the final division; median/percentile interpolate identically on
    * those integers in both engines (the q15-proven path). Conversions
    * only count when the purchase is at or after the first view. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
    def firstOf(t: String): Column =
      min(when(col("event_type") === t, col("ts")))
    ev.groupBy("user_id")
      .agg(firstOf("view").as("first_view"),
        firstOf("purchase").as("first_purchase"))
      .filter(col("first_view").isNotNull)
      .select(to_date(col("first_view")).as("cohort_day"),
        when(col("first_purchase") >= col("first_view"),
          unix_micros(col("first_purchase")) - unix_micros(col("first_view")))
          .as("gap_us"))
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"),
        count(col("gap_us")).as("n_converted"),
        (expr("median(gap_us)") / 1000000.0).as("median_s"),
        (expr("percentile(gap_us, 0.9d)") / 1000000.0).as("p90_s"))
      .orderBy("cohort_day")
  }

  /** q169: distribution drift between two corpus snapshots — the
    * Population Stability Index, the standard drift gate a data
    * pipeline runs before retraining on a new crawl/window. The event
    * stream's first half (reference window A) is compared against the
    * second half (current window B) per event_type: `value` is
    * histogrammed into fixed $50 buckets and each bucket contributes
    * `(p−q)·ln(p/q)` with Laplace-smoothed shares `p=(n+1)/(N+10)`
    * (smoothing keeps empty-on-one-side buckets finite and
    * deterministic; PSI > 0.2 is the conventional "investigate"
    * threshold).
    *
    * Determinism: per-bucket contributions are floor-scaled to BIGINT
    * nano-units BEFORE the per-type sum, so the reduction is exact
    * integer addition (order-independent under partial aggregation) —
    * the q110/q111 fixed-point discipline. Scale: one groupBy at
    * (type, bucket) grain — a few dozen rows regardless of input size —
    * then windows over that reduced grain; the scan aggregates with
    * map-side combine, nothing else moves. */
  def distributionDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_type"), driftBucket, (col("ts") < DriftBoundary).as("is_a"))
    psiFrom(e.groupBy("event_type", "bucket")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("n_b")))
  }

  /** The q169 window boundary and $50 value bucket (shared with the
    * continuous monitor, [[graft.streaming.StreamingDrift]]). */
  val DriftBoundary: Column = lit("2024-01-16 00:00:00").cast("timestamp")
  def driftBucket: Column =
    least(floor(col("value") / 50.0), lit(9L)).cast("int").as("bucket")

  /** PSI arithmetic over a `(event_type, bucket, n_a, n_b)` count
    * frame — extracted so the batch gate (q169) and the continuous
    * monitor (q176) share one definition of the statistic. */
  def psiFrom(g: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
    val p = (col("n_a") + 1).cast("double") / (col("tot_a") + 10)
    val q = (col("n_b") + 1).cast("double") / (col("tot_b") + 10)
    g.withColumn("tot_a", sum("n_a").over(w))
      .withColumn("tot_b", sum("n_b").over(w))
      .withColumn("c9",
        floor((p - q) * log(p / q) * lit(1000000000.0) + lit(0.5))
          .cast("long"))
      .withColumn("contrib", col("c9").cast("double") / 1000000000.0)
      .withColumn("psi", sum("c9").over(w).cast("double") / 1000000000.0)
      .select("event_type", "bucket", "n_a", "n_b", "contrib", "psi")
      .orderBy("event_type", "bucket")
  }

  /** q199: join-skew advisor — per prospective join key of the fact
    * table, the distribution numbers a planner (human or AQE) reads
    * before picking a strategy: distinct-key count, the hottest key's
    * row count, its share of the table, and the skew ratio
    * (max / mean per-key count — the statistic
    * `spark.sql.adaptive.skewJoin.skewedPartitionFactor` thresholds
    * on). Ratio > ~5 says "salt this key or let AQE split it"
    * (q75/q59 are the salting shapes this mart dispatches to).
    *
    * Scale: one map-side-combinable count per key column, then a
    * 1-row reduction each — the scan dominates, the stats are
    * metadata-sized. All-integer inputs; ratios are single IEEE
    * divisions stated identically in the oracle. */
  def skewAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def statsFor(keyCol: String): DataFrame =
      li.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_cnt"))
        .select(lit(keyCol).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_cnt"),
          (col("max_cnt").cast("double") /
            (col("n_rows").cast("double") / col("n_keys")))
            .as("skew_ratio"),
          (col("max_cnt").cast("double") / col("n_rows")).as("top1_share"))
    statsFor("l_orderkey")
      .union(statsFor("l_partkey"))
      .union(statsFor("l_suppkey"))
      .orderBy("join_key")
  }

  /** q227 — classical seasonal decomposition of daily revenue with
    * anomaly flags: trend = centered 7-row moving average, seasonal =
    * per-weekday mean of the detrended series, residual = the rest,
    * anomaly = |residual| beyond 2σ. The time-series health view the
    * reference's dashboard family implies (daily KPI with "is today
    * weird?") — and the residual feed for any alerting rule.
    *
    * Exactness discipline: the detrended value is kept as the INTEGER
    * 7·cents − Σ₇cents (multiplying through by the window width avoids
    * a rational mid-pipeline), weekday means and σ divide out of exact
    * integer moments, and the residual milli-scales before the
    * variance. Windows run over DAY grain (a few thousand rows at any
    * corpus scale — the q47 aggregate-grain class). */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents2(col("o_totalprice"))).as("cents"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val t = d
      .withColumn("sum7", sum("cents").over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .filter(col("cnt7") === 7)
      .withColumn("d1", col("cents") * 7 - col("sum7")) // 700ths of $
      .withColumn("dow", weekday(col("day")))
      .localCheckpoint() // weekday means + the residual pass
    val seas = t.groupBy("dow")
      .agg((sum("d1").cast("double") / count(lit(1))
        / lit(7.0) / lit(100.0)).as("seasonal"))
    val scored = t.join(broadcast(seas), "dow")
      .withColumn("residual",
        col("d1").cast("double") / lit(700.0) - col("seasonal"))
      // whole-dollar quantization: day-grain residuals reach ±1e6
      // dollars, so milli-scaling would overflow the squared moments
      .withColumn("r0",
        floor(col("residual") + lit(0.5)).cast("long"))
    val sig = scored.agg(count(lit(1)).as("n"), sum("r0").as("s1"),
      sum(col("r0") * col("r0")).as("s2"))
    // moments convert exactly to doubles (both < 2^53); the n·s2
    // integer form would overflow longs at sf0.1's residual scale
    scored.crossJoin(broadcast(sig))
      .withColumn("sigma",
        sqrt(col("s2").cast("double") / col("n").cast("double")
          - (col("s1").cast("double") / col("n").cast("double"))
            * (col("s1").cast("double") / col("n").cast("double"))))
      .select(col("day"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("sum7").cast("double") / lit(700.0)).as("trend"),
        val6(col("seasonal")).as("seasonal"),
        val6(col("residual")).as("residual"),
        (abs(col("residual")) > lit(2.0) * col("sigma"))
          .as("is_anomaly"))
      .orderBy("day")
  }

  /** q230 — join-cardinality estimation audit: the textbook CBO
    * formula |A⋈B| ≈ |A|·|B| / max(ndv_A, ndv_B) evaluated against the
    * TRUE join cardinality for the three fact joins — the estimator
    * every cost-based optimizer (Spark's included) runs on ANALYZE
    * stats before choosing a join order. The ratio column is the
    * calibration a planner reads: ≈1 under the uniformity+containment
    * assumptions the formula encodes, drifting exactly where real key
    * distributions violate them (the q199 skew advisor's territory).
    *
    * Inputs are four exact scalars per join (row counts + distinct key
    * counts — at 100 TB these come from the stats catalog, not a
    * scan); the actual is one counted join. One integer multiply and
    * two divisions per row. */
  def cardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def audit(name: String, a: DataFrame, ka: String,
        b: DataFrame, kb: String): (String, Long, Long, Long, Long) = {
      // one aggregate job per side (count + exact NDV ride the same
      // pass) instead of four sequential count/distinct jobs — 15
      // driver actions → 9 for the three audits (r10, guide §1.2).
      // Contract: keys must be NON-NULL (countDistinct excludes NULLs
      // where the pre-r10 select(key).distinct().count() counted NULL
      // as one value) — true for every TPC-H join key audited here.
      def stats(df: DataFrame, key: String): (Long, Long) = {
        val r = df.agg(count(lit(1)), countDistinct(col(key))).head()
        (r.getLong(0), r.getLong(1))
      }
      val (na, da) = stats(a, ka)
      val (nb, db) = stats(b, kb)
      val actual = a.join(b, a(ka) === b(kb)).count()
      (name, na, nb, math.max(da, db), actual)
    }
    val li = Tables.lineitem(spark, dir)
    val rows = Seq(
      audit("orders~customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      audit("lineitem~orders", li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      audit("lineitem~part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
    rows.toDF("join_key", "n_left", "n_right", "ndv_max", "actual")
      .withColumn("estimate",
        floor((col("n_left") * col("n_right")).cast("double")
          / col("ndv_max").cast("double") + lit(0.5)).cast("long"))
      .select(col("join_key"), col("n_left"), col("n_right"),
        col("ndv_max"), col("estimate"), col("actual"),
        val6(col("estimate").cast("double") / col("actual").cast("double"))
          .as("est_over_actual"))
      .orderBy("join_key")
  }

  /** q224 — Poisson-bootstrap standard error of a corpus statistic
    * (here: mean order value), in ONE pass. The classic bootstrap
    * resamples n rows with replacement — impossible to coordinate
    * across a cluster; the Poisson bootstrap (public technique, used
    * for exactly this at web scale) gives each row an independent
    * Poisson(1) weight per replicate, which needs NO coordination: a
    * row's 32 replicate weights derive from its own key hash, so the
    * whole uncertainty estimate is one scan + a replicate-grain reduce.
    *
    * Determinism end-to-end: the Poisson draw is inverse-CDF over the
    * portable hash (thresholds are shared Scala constants, truncated at
    * k = 4); per-replicate sums are exact longs (integer cents ×
    * integer weights); replicate means milli-floor-scale before the
    * across-replicate variance, which is integer-moment arithmetic —
    * no float ever crosses a row boundary in any order. */
  def bootstrapSe(spark: SparkSession, dir: String,
      reps: Int = 32): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents2(col("o_totalprice")).as("cents"))
    val rep = o.select(col("o_orderkey"), col("cents"),
      explode(sequence(lit(0), lit(reps - 1))).as("r"))
    val u = portable32(concat(col("o_orderkey").cast("string"),
      lit(":"), col("r").cast("string"))).cast("double") / lit(4294967296.0)
    // build innermost-first (largest threshold) so the final expression
    // tests the SMALLEST threshold first — the inverse-CDF order
    val k = PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(PoissonCdf.length): org.apache.spark.sql.Column) {
        case (acc, (c, i)) => when(u < lit(c), lit(i)).otherwise(acc)
      }
    val perRep = rep.withColumn("k", k.cast("long"))
      .groupBy("r")
      .agg(sum(col("k") * col("cents")).as("num"), sum("k").as("den"))
      .withColumn("m3", floor(col("num").cast("double") / lit(100.0)
        / col("den").cast("double") * lit(1000.0) + lit(0.5))
        .cast("long"))
    val overall = o.agg(count(lit(1)).as("n_rows"),
      (sum("cents").cast("double") / lit(100.0) / count(lit(1)))
        .as("mean_value"))
    // center replicate means on the overall mean before the integer
    // moments (variance is shift-invariant; uncentered m3² would
    // overflow longs at 32 replicates × (1.5e8)²)
    perRep
      .crossJoin(broadcast(overall))
      .withColumn("d3", col("m3")
        - floor(col("mean_value") * lit(1000.0) + lit(0.5)).cast("long"))
      .groupBy("n_rows", "mean_value")
      .agg(count(lit(1)).as("n_reps"), sum("d3").as("s1"),
        sum(col("d3") * col("d3")).as("s2"))
      .select(col("n_rows"), col("n_reps"),
        val6(col("mean_value")).as("mean_value"),
        val6(
          sqrt(((col("n_reps") * col("s2") - col("s1") * col("s1"))
            .cast("double"))
            / (col("n_reps") * (col("n_reps") - 1)).cast("double"))
            / lit(1000.0)).as("bootstrap_se"))
  }

  /** Poisson(1) inverse-CDF thresholds (cumulative pmf at k=0..3) —
    * shared verbatim with the oracle; draws ≥ the last threshold
    * truncate to k = 4. */
  val PoissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    Seq(e, 2 * e, 2.5 * e, 8.0 / 3.0 * e)
  }

  /** q225 — capture–recapture catalog estimation (Chapman's
    * bias-corrected Lincoln–Petersen — the ecology estimator that
    * data-world reuses to answer "how many distinct entities EXIST,
    * beyond what we've crawled"): two overlapping observation windows
    * (parts ordered in the first vs second half of the date range)
    * estimate the full catalog as N̂ = (n1+1)(n2+1)/(m+1) − 1. Against
    * TPC-H's known part count the estimator's error is itself part of
    * the mart — the calibration a production crawl-coverage model
    * needs.
    *
    * All counts are exact set cardinalities (distinct reduces); the
    * estimate is one integer product and one division. Scale: two
    * distinct aggregations over the fact scan + metadata arithmetic. */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey").as("l_orderkey"),
            to_date(col("o_orderdate")).as("day")),
        "l_orderkey")
    val bounds = Tables.orders(spark, dir)
      .agg(min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
    val seen = base.crossJoin(broadcast(bounds))
      .withColumn("half",
        when(datediff(col("day"), col("d0")) * 2
          <= datediff(col("d1"), col("d0")), 1).otherwise(2))
      .select(col("half"), col("l_partkey"))
      .distinct()
      .localCheckpoint() // window counts + the overlap semi-join
    val n1 = seen.filter(col("half") === 1)
      .agg(count(lit(1)).as("n1"))
    val n2 = seen.filter(col("half") === 2)
      .agg(count(lit(1)).as("n2"))
    val m = seen.filter(col("half") === 1).select("l_partkey")
      .join(seen.filter(col("half") === 2).select("l_partkey"),
        Seq("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("m"))
    val truth = Tables.part(spark, dir).agg(count(lit(1)).as("truth"))
    val est = (col("n1") + 1).cast("double")
      .*((col("n2") + 1).cast("double"))
      ./((col("m") + 1).cast("double")) - lit(1.0)
    n1.crossJoin(n2).crossJoin(m).crossJoin(broadcast(truth))
      .select(col("n1").as("n_first_half"),
        col("n2").as("n_second_half"), col("m").as("n_overlap"),
        val6(est).as("chapman_estimate"),
        col("truth").as("n_catalog"),
        val6(est / col("truth").cast("double")).as("est_over_truth"))
  }

  /** q217 — contrastive TRIPLET mining for a two-tower recommendation
    * embedding: per anchor part, one POSITIVE (its strongest co-order
    * partner — support-max, id tie-break) and one deterministic
    * NEGATIVE (the first hash probe that is not a known positive) — the
    * (anchor, positive, negative) training rows a retrieval/recsys
    * embedding model consumes. The negative draw is hash-sequenced, not
    * random: probe j is h32(anchor:j) mod |parts|, and the first probe
    * outside the anchor's positive set wins — reproducible across runs
    * and engines, which is what makes the training SET itself a
    * verifiable artifact (the corpus-release discipline applied to
    * supervised pairs).
    *
    * Scale: co-order support rides the in-row basket explosion (q68's
    * argument, [[MaxBasketWidth]]-bounded); positives and probes are
    * anchor-grain; the negative rejection check is a left-anti join
    * against the pair list, probes-bounded per anchor. No stage touches
    * |parts|² — rejection sampling against the positive set replaces
    * the "all parts minus positives" complement a naive miner builds.
    *
    * Plan shape (the round-8 collapse — was 2 localCheckpoints + a
    * min-j self-join + a final best⋈neg join): ONE forward pipeline.
    * The best positive is a `max_by` over (support, −b) in the
    * anchor-grain aggregate (no window), pos_id/support ride the probe
    * explosion as payload so the surviving min-j row IS the output row
    * (no join back), and min-j itself is one row_number window on the
    * probes-bounded valid set. co still materializes once per consumer
    * pass via exchange reuse rather than an eager checkpoint barrier. */
  def tripletMining(spark: SparkSession, dir: String,
      minSupport: Long = 2, probes: Int = 5): DataFrame = {
    val co = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("l_partkey"))),
        1, MaxBasketWidth).as("parts"))
      .select(explode(col("parts")).as("a"), col("parts"))
      .select(col("a"), explode(col("parts")).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

    // support-max positive, id tie-break: max over the (support, −b)
    // struct ordering ≡ the old (support desc, b asc) rank-1 window,
    // without the per-anchor sort
    val best = co.groupBy(col("a").as("anchor_id"))
      .agg(max_by(col("b"), struct(col("support"), -col("b")))
          .as("pos_id"),
        max(col("support")).as("support"))

    val m = Tables.part(spark, dir).count()
    val cand = best
      .withColumn("j", explode(sequence(lit(0), lit(probes - 1))))
      // +1 maps the probe into the ACTUAL 1-based p_partkey domain
      // [1, m] — pmod alone draws from [0, m-1], which can emit a
      // neg_id of 0 (no such part) and can never sample part m
      .withColumn("cand",
        pmod(portable32(concat(col("anchor_id").cast("string"),
          lit(":"), col("j").cast("string"))), lit(m)) + lit(1L))
    cand
      .join(co.select(col("a").as("anchor_id"), col("b").as("cand")),
        Seq("anchor_id", "cand"), "left_anti")
      .filter(col("cand") =!= col("anchor_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("anchor_id").orderBy("j")))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("pos_id"), col("support"),
        col("cand").as("neg_id"))
      .orderBy("anchor_id")
  }

  /** q246 — robust location statistics (10% trimmed and winsorized
    * means) of order value per market segment. Outlier-robust spend
    * summaries are the form dashboards should ship when a handful of
    * mega-orders would otherwise drag the plain mean — and robust
    * per-stratum location is the same primitive corpus curation uses
    * to set quality-score cutoffs that one viral document can't move.
    *
    * Quantiles are RANK-based, not interpolated: with per-segment
    * counts n and k = ⌊0.1·n⌋, the trimmed mean averages ranks
    * (k, n−k] and the winsorized mean clamps the k tail ranks on each
    * side to the boundary-rank values. Ties break on o_orderkey, so
    * the rank assignment — and therefore every output — is exactly
    * reproducible on any engine; no percentile-interpolation floats
    * anywhere. Money rides the [[graft.util.Portable]] integer-cents
    * rail; the two final divisions are single IEEE ops.
    *
    * Scale shape: one broadcast dim join (customer segment), ONE
    * shuffle on the 5-value segment key shared by the window and the
    * final aggregate (same key → AQE reuses the exchange). Per-segment
    * sorted partitions are the textbook skew worry at 100 TB; the cure
    * is the same two-phase range-rank [[Relational.denseGlobalRank]]
    * uses, applied per segment — at TPC-H's 5-segment grain a direct
    * window is the honest local plan. */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        cents2(col("o_totalprice")).as("cents"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("mktsegment"), col("o_orderkey"),
        col("cents"))
    val byValue = Window.partitionBy("mktsegment")
      .orderBy(col("cents"), col("o_orderkey"))
    val whole = Window.partitionBy("mktsegment")
    val ranked = o
      .withColumn("rk", row_number().over(byValue).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("k", floor(col("n") * lit(0.1)).cast("long"))
    ranked.groupBy("mktsegment")
      .agg(
        max("n").as("n_orders"),
        max("k").as("k_trim"),
        sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
          col("cents"))).as("interior"),
        max(when(col("rk") === col("k") + 1, col("cents"))).as("lo_c"),
        max(when(col("rk") === col("n") - col("k"), col("cents")))
          .as("hi_c"))
      .select(
        col("mktsegment"),
        col("n_orders"),
        col("k_trim"),
        (col("interior").cast("double") / lit(100.0)
          / (col("n_orders") - lit(2L) * col("k_trim")).cast("double"))
          .as("trimmed_mean"),
        ((col("interior") + col("k_trim") * (col("lo_c") + col("hi_c")))
          .cast("double") / lit(100.0) / col("n_orders").cast("double"))
          .as("winsor_mean"),
        (col("lo_c").cast("double") / lit(100.0)).as("lo_clamp"),
        (col("hi_c").cast("double") / lit(100.0)).as("hi_clamp"))
      .orderBy("mktsegment")
  }

  /** q249: item-item collaborative-filtering recommendations — cosine
    * similarity over order co-occurrence (Sarwar et al. 2001, the
    * "customers who bought X also bought" mart every commerce stack
    * serves). For parts u, v with co-purchase support co(u,v) and
    * order-degrees d(u), d(v):
    *
    *   cosine(u, v) = co(u,v) / √(d(u)·d(v))
    *
    * ranked per item (ties → higher support, then smaller partner id)
    * and cut to the top `topN`. The `minCo ≥ 2` support floor is
    * q243's association-strength argument: one shared order is random
    * background, repeat co-purchase is signal — and it keeps the
    * candidate pair set sparse.
    *
    * Exactness: co and the degrees are exact integers; d(u)·d(v) is an
    * exact BIGINT product well under 2^53, so √ and the division are
    * single correctly-rounded IEEE ops — bit-identical in any engine
    * (the ranking happens on those exact doubles, the output rounds
    * via the Portable 6-decimal form).
    *
    * Scale: pair fan-out is in-row and [[MaxBasketWidth]]-bounded (the
    * q68 shape — linear in orders, never quadratic in a mega-basket;
    * the fixture guard asserts the cap never binds so the uncapped
    * oracle matches); support count is one pair-grain shuffle; degrees
    * are vertex-grain → broadcast; the per-item top-N is one window
    * over the support-filtered sparse pair set. */
  def itemItemRecs(spark: SparkSession, dir: String, topN: Int = 5,
      minCo: Long = 2): DataFrame = {
    val byItem = Window.partitionBy("u")
      .orderBy(desc("cosine"), desc("co"), asc("v"))
    coSupport(spark, dir, minCo)
      .withColumn("cosine", col("co").cast("double")
        / sqrt((col("du") * col("dv")).cast("double")))
      .withColumn("rank", row_number().over(byItem))
      .filter(col("rank") <= topN)
      .select(col("u").as("part_id"), col("rank").cast("long").as("rank"),
        col("v").as("rec_part_id"), col("co"),
        val6(col("cosine")).as("cosine"))
      .orderBy("part_id", "rank")
  }

  /** The directed co-purchase support frame shared by q249 and q256:
    * (u, v, co, du, dv) over distinct (order, part) with the
    * [[MaxBasketWidth]]-bounded in-row pair fan-out and vertex-grain
    * degree broadcasts. `co ≥ minCo` keeps the pair set sparse.
    * `withBasketCount` additionally carries the basket total N as an
    * `n_baskets` column via a broadcast 1-row cross join — the basket
    * frame's own count, so q256's lift denominator rides THIS dag
    * (exchange-reused) instead of a separate driver-side
    * `distinct().count()` action. */
  private[graft] def coSupport(spark: SparkSession, dir: String,
      minCo: Long, withBasketCount: Boolean = false): DataFrame = {
    val bo = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val deg = bo.groupBy(col("l_partkey").as("id"))
      .agg(count(lit(1)).as("d"))
    val baskets = bo
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("l_partkey"))),
        1, MaxBasketWidth).as("ps"))
    val pairs = baskets
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .join(broadcast(deg.select(col("id").as("u"), col("d").as("du"))),
        "u")
      .join(broadcast(deg.select(col("id").as("v"), col("d").as("dv"))),
        "v")
    if (!withBasketCount) pairs
    else pairs.crossJoin(
      broadcast(baskets.agg(count(lit(1)).as("n_baskets"))))
  }

  /** q256: association rules — the market-basket classic (Agrawal &
    * Srikant's support/confidence plus the lift correction): for each
    * repeat-co-purchased directed pair u→v, confidence = co/d(u)
    * (P(v|u)) and lift = co·N / (d(u)·d(v)) (observed-over-expected
    * under independence, N = basket count). The global top-`topK` by
    * lift is the rules mart a merchandiser reads; q249 is the same
    * support frame ranked per-item by cosine — one candidate
    * derivation, two serving views.
    *
    * Exactness: co·N and d(u)·d(v) are exact BIGINT products (< 2^53
    * at these scales, deterministic casts beyond), each ratio ONE
    * IEEE division, val6 at the edge; ranking on the raw lift with
    * (co desc, u, v) ties.
    *
    * Scale: [[coSupport]]'s shapes plus a global top-k
    * (TakeOrderedAndProject — a distributed heap, no full sort). The
    * basket total N rides the coSupport dag as a broadcast 1-row
    * column (withBasketCount) — no separate count action. */
  def associationRules(spark: SparkSession, dir: String,
      topK: Int = 20, minCo: Long = 2): DataFrame = {
    val lift = (col("co") * col("n_baskets")).cast("double") /
      (col("du") * col("dv")).cast("double")
    val w = Window.orderBy(desc("lift_raw"), desc("co"), asc("u"),
      asc("v"))
    coSupport(spark, dir, minCo, withBasketCount = true)
      .withColumn("lift_raw", lift)
      .orderBy(desc("lift_raw"), desc("co"), asc("u"), asc("v"))
      .limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("u").as("antecedent"),
        col("v").as("consequent"), col("co").as("support"),
        val6(col("co").cast("double") / col("du").cast("double"))
          .as("confidence"),
        val6(col("lift_raw")).as("lift"))
      .orderBy("rank")
  }

  /** q250: EWMA revenue forecast with anomaly flags — the exponential
    * smoothing baseline (Holt's level-only form) every KPI alerting
    * stack runs: tomorrow's expectation is a recency-weighted mean of
    * the trailing window, and "today is weird" means actual strayed
    * beyond a band around that expectation. Complements q227: the
    * decomposition explains structure AFTER the fact; this is the
    * one-step-ahead FORECAST (only prior days feed each prediction).
    *
    * Exactness — the whole point of the α = 1/2 choice: weights
    * 2^(W−k) over the trailing W = 8 observed days make the forecast
    * numerator/denominator EXACT BIGINTs (integer cents × powers of
    * two), so the forecast is one deterministic IEEE division and the
    * anomaly test cross-multiplies integers (high: actual·den >
    * 3/2·num, i.e. 2·cents·den > 3·num — no float compare at all).
    *
    * Scale: the day-grain aggregate is the only full-data pass;
    * everything after runs at day grain (a few thousand rows at ANY
    * corpus scale — the q227 aggregate-grain class, so the
    * single-partition window is metadata-sized by construction). */
  def ewmaForecast(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents2(col("o_totalprice"))).as("cents"))
    ewmaFrom(d, Nil).orderBy("day")
  }

  /** q252: CUPED experiment readout (Deng et al. 2013) — the variance
    * reduction every mature experimentation platform applies before
    * calling a winner: adjust each user's post-period metric by their
    * PRE-period covariate, Y' = Y − θ(X − X̄), with θ = cov(X,Y)/var(X)
    * fitted POOLED (assignment-independent, so the adjustment is
    * unbiased). Arms are the deterministic hash split a real platform
    * uses (portable32(user_id) mod 2 — reproducible, joinable,
    * oracle-mirrorable); the pre/post boundary is q169's
    * [[DriftBoundary]]. Emits per arm: n, raw and adjusted means, θ,
    * and the achieved variance ratio var(Y')/var(Y) — the number that
    * says how much smaller the experiment could have been.
    *
    * Exactness (the q102 discipline): per-user X/Y are integer cents;
    * the five power sums per arm are exact BIGINTs (order-independent
    * under any partial agg); every downstream scalar (θ, means,
    * variances) is ONE fixed-shape double expression over those exact
    * operands — deterministic IEEE in any engine, val6 at the edge.
    *
    * Scale: one user-grain aggregate over events (map-side
    * combinable), then arm-grain (2 rows) + a broadcast 1-row pooled
    * frame. Nothing after the first aggregate touches data grain. */
  def cupedExperiment(spark: SparkSession, dir: String): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val user = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(isPurchase && col("ts") < DriftBoundary,
          cents2(col("value")))), lit(0L)).as("x"),
        coalesce(sum(when(isPurchase && col("ts") >= DriftBoundary,
          cents2(col("value")))), lit(0L)).as("y"))
      .withColumn("arm",
        when(pmod(portable32(col("user_id").cast("string")), lit(2)) === 0,
          lit("control")).otherwise(lit("treatment")))
    def moments(g: org.apache.spark.sql.RelationalGroupedDataset) = g
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val arm = moments(user.groupBy("arm"))
    val pooled = moments(user.groupBy())
      .select(col("n").as("pn"), col("sx").as("px"), col("sy").as("py"),
        col("sxx").as("pxx"), col("sxy").as("pxy"))
    def d(c: String) = col(c).cast("double")
    val theta = (d("pn") * d("pxy") - d("px") * d("py")) /
      (d("pn") * d("pxx") - d("px") * d("px"))
    val meanX = d("sx") / d("n")
    val meanY = d("sy") / d("n")
    val varY = d("syy") / d("n") - meanY * meanY
    val varX = d("sxx") / d("n") - meanX * meanX
    val covXY = d("sxy") / d("n") - meanX * meanY
    val varAdj = varY - lit(2.0) * col("theta") * covXY +
      col("theta") * col("theta") * varX
    arm.crossJoin(broadcast(pooled))
      .withColumn("theta", theta)
      .select(col("arm"), col("n"),
        val6(meanX / lit(100.0)).as("pre_mean"),
        val6(meanY / lit(100.0)).as("post_mean"),
        val6((meanY - col("theta") * (meanX - d("px") / d("pn")))
          / lit(100.0)).as("adj_post_mean"),
        val6(col("theta")).as("theta"),
        val6(varAdj / varY).as("var_ratio"))
      .orderBy("arm")
  }

  /** q253: two-proportion z readout — the significance call that
    * follows q252's variance reduction: post-period purchase
    * CONVERSION per arm (same deterministic hash split), pooled
    * standard error, and the z statistic every experimentation
    * dashboard prints next to the lift. The z VALUE is emitted, not a
    * p-value — Φ⁻¹ needs erf, which is libm (not bit-portable); the
    * ±1.96 decision threshold is stated as the boolean instead.
    *
    * Exactness: conversion counts are exact integers from one
    * user-grain pass; z is a single fixed-shape expression over six
    * exact operands (sqrt and divisions are correctly-rounded IEEE).
    *
    * Scale: one map-side-combinable aggregate over events to user
    * grain, one 4-scalar global aggregate. Output is one row. */
  def conversionZ(spark: SparkSession, dir: String): DataFrame = {
    // "converted" = post-period purchase spend ≥ $300 — the fixture's
    // every-user-buys density makes raw did-purchase degenerate
    // (p̂ = 1 ⇒ zero pooled variance), so the readout is on a real
    // revenue goal, which is what commerce experiments measure anyway
    val user = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(coalesce(sum(when(col("event_type") === "purchase"
        && col("ts") >= DriftBoundary, cents2(col("value")))), lit(0L))
        .as("cents"))
      .select(
        (pmod(portable32(col("user_id").cast("string")), lit(2)) === 0)
          .as("is_control"),
        (col("cents") >= 30000L).as("converted"))
    def d(c: Column) = c.cast("double")
    val g = user.agg(
      sum(when(col("is_control"), 1L).otherwise(0L)).as("n_control"),
      sum(when(col("is_control") && col("converted"), 1L).otherwise(0L))
        .as("conv_control"),
      sum(when(!col("is_control"), 1L).otherwise(0L)).as("n_treatment"),
      sum(when(!col("is_control") && col("converted"), 1L).otherwise(0L))
        .as("conv_treatment"))
    val p1 = d(col("conv_control")) / d(col("n_control"))
    val p2 = d(col("conv_treatment")) / d(col("n_treatment"))
    val pp = d(col("conv_control") + col("conv_treatment")) /
      d(col("n_control") + col("n_treatment"))
    val z = (p2 - p1) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / d(col("n_control")) + lit(1.0) / d(col("n_treatment"))))
    g.select(col("n_control"), col("conv_control"),
        col("n_treatment"), col("conv_treatment"),
        val6(p1).as("rate_control"), val6(p2).as("rate_treatment"),
        val6(z).as("z"),
        (abs(z) > lit(1.96)).as("significant"))
  }

  /** q255: forecast BACKTEST — the evaluation loop that keeps q250
    * honest: replay the one-step-ahead forecast over history and
    * score it (sMAPE, signed bias, anomaly-flag rates). Without this
    * a forecaster is vibes; with it, the alerting threshold is a
    * measured trade-off.
    *
    * Exactness trick: the forecast is the RATIONAL num/den, so every
    * per-day error term clears denominators into exact integers —
    * sMAPE's |a−f| / ((a+f)/2) becomes 2·|a·den−num| / (a·den+num),
    * ONE IEEE division per day — and per-day ratios floor-scale to
    * nano units before the mean (order-independent sum, the BM25 c9
    * discipline). No float accumulates across rows anywhere.
    *
    * Scale: q250's shapes — one full-data aggregate, then day grain. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val window = 8
    val d = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents2(col("o_totalprice"))).as("cents"))
    val w = Window.orderBy("day")
    val terms = (1 to window).map { k =>
      val wt = 1L << (window - k)
      (coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(wt),
        when(lag(col("cents"), k).over(w).isNotNull, lit(wt))
          .otherwise(lit(0L)))
    }
    val ad = col("cents") * col("den") // a·den, exact
    val scored = d
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .filter(col("den") > 0)
      .select(
        floor(lit(2.0) * abs(ad - col("num")).cast("double")
          / (ad + col("num")).cast("double") * lit(1000000000.0)
          + lit(0.5)).cast("long").as("smape9"),
        floor((ad - col("num")).cast("double")
          / (ad + col("num")).cast("double") * lit(1000000000.0)
          + lit(0.5)).cast("long").as("bias9"),
        when(col("cents") * lit(2) * col("den") > col("num") * lit(3),
          1L).otherwise(0L).as("hi"),
        when(col("cents") * lit(2) * col("den") < col("num"), 1L)
          .otherwise(0L).as("lo"))
    scored.agg(count(lit(1)).as("n_days"), sum("smape9").as("s9"),
        sum("bias9").as("b9"), sum("hi").as("n_high"),
        sum("lo").as("n_low"))
      .select(col("n_days"),
        val6(col("s9").cast("double") / col("n_days").cast("double")
          / lit(1000000000.0)).as("smape"),
        val6(col("b9").cast("double") / col("n_days").cast("double")
          / lit(1000000000.0)).as("bias"),
        col("n_high"), col("n_low"),
        val6((col("n_high") + col("n_low")).cast("double")
          / col("n_days").cast("double")).as("alert_rate"))
  }

  /** q257: revenue concentration — per-segment Gini coefficient and
    * top-decile share over ACTIVE customers (the 80/20 readout behind
    * every key-account strategy, and the skew diagnostic q199 reads
    * at the partition level applied to the business itself). Gini via
    * the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    * ascending (cents, custkey)-ranked spend.
    *
    * Exactness: spend is integer cents; Σ i·xᵢ, (n+1)·Σx, n·Σx are
    * exact BIGINTs (≤ ~2^51 at sf0.1's grain); each output is one
    * deterministic IEEE division, val6 at the edge. The q246 rank
    * discipline: ties break on custkey so ranks are exact.
    *
    * Scale: customer-grain aggregate (map-side combinable), broadcast
    * segment dim, then the per-segment window at customer grain —
    * same shape as [[robustStats]], same two-phase range-rank cure if
    * a single segment outgrows a partition. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val cc = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents2(col("o_totalprice"))).as("cents"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("mktsegment"), col("o_custkey"),
        col("cents"))
    val bySpend = Window.partitionBy("mktsegment")
      .orderBy(col("cents"), col("o_custkey"))
    val whole = Window.partitionBy("mktsegment")
    val ranked = cc
      .withColumn("rk", row_number().over(bySpend).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("k", floor(col("n") * lit(0.1)).cast("long"))
    ranked.groupBy("mktsegment")
      .agg(max("n").as("n"), max("k").as("k"),
        sum("cents").as("sx"),
        sum(col("rk") * col("cents")).as("srx"),
        sum(when(col("rk") > col("n") - col("k"), col("cents")))
          .as("topc"))
      .select(col("mktsegment"), col("n").as("n_customers"),
        (col("sx").cast("double") / lit(100.0)).as("revenue"),
        val6((lit(2L) * col("srx") - (col("n") + lit(1L)) * col("sx"))
          .cast("double") / (col("n") * col("sx")).cast("double"))
          .as("gini"),
        val6(col("topc").cast("double") / col("sx").cast("double"))
          .as("top_decile_share"))
      .orderBy("mktsegment")
  }

  /** q258: inter-purchase interval profile — the cadence statistic
    * behind replenishment reminders and churn horizons: per-user gaps
    * between consecutive purchases, summarized as hour-grain
    * quantiles + mean/max. Quantiles come from the BUCKETED CDF
    * (hour-grain histogram, ~720 buckets for a 30-day span), not a
    * global rank: the q160 argument — the only data-grain work is one
    * per-user lag and one bucket-grain aggregate; the quantile walk
    * runs on the metadata-sized bucket table, and the thresholds are
    * INTEGER cross-multiplications (cum·2 ≥ n, cum·10 ≥ 9n — no
    * float quantile anywhere).
    *
    * Exactness: gaps are exact µs integers (ties in the per-user
    * order break on event_id); bucket = integer division; mean is the
    * exact µs sum over one IEEE division chain. */
  def purchaseGaps(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select((col("us") - col("prev")).as("gap_us"))
    val b = gaps
      .groupBy(expr("gap_us DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("c"), sum("gap_us").as("s"))
    val cum = b
      .withColumn("cum", sum("c").over(Window.orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = b.agg(sum("c").as("n"), sum("s").as("sus"))
    cum.crossJoin(broadcast(tot))
      .agg(max("n").as("n_gaps"),
        min(when(col("cum") * 2 >= col("n"), col("h"))).as("median_h"),
        min(when(col("cum") * 10 >= col("n") * 9, col("h"))).as("p90_h"),
        max("h").as("max_h"), max("sus").as("sus"))
      .select(col("n_gaps"), col("median_h").as("median_gap_hours"),
        col("p90_h").as("p90_gap_hours"), col("max_h").as("max_gap_hours"),
        val6(col("sus").cast("double") / col("n_gaps").cast("double")
          / lit(3600000000.0)).as("mean_gap_hours"))
  }

  /** q259: hierarchical share-of-parent rollup — the drill-down table
    * every revenue report renders: nation rows carrying their share
    * of the parent region, their rank within it, and the region's
    * share of the world. States the hierarchy ONCE at the leaf grain
    * instead of three disconnected GROUP BYs.
    *
    * Exactness: integer-cents sums at nation grain; region and world
    * totals are window sums over the 25-row nation frame (metadata-
    * sized at any corpus scale); each share is one IEEE division.
    *
    * Scale: one fact aggregate to nation grain (broadcast dim joins),
    * then everything runs on ≤ |nations| rows. */
  def revenueByGeo(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name"))
    val byNation = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(cents2(col("o_totalprice"))).as("cents"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val regionW = Window.partitionBy("r_name")
    val worldW = Window.partitionBy(lit(1))
    byNation
      .withColumn("rcents", sum("cents").over(regionW))
      .withColumn("wcents", sum("cents").over(worldW))
      .withColumn("rank_in_region", row_number().over(
        Window.partitionBy("r_name")
          .orderBy(desc("cents"), asc("n_name"))).cast("long"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("n_orders"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("cents").cast("double") / col("rcents").cast("double"))
          .as("share_of_region"),
        col("rank_in_region"),
        val6(col("rcents").cast("double") / col("wcents").cast("double"))
          .as("region_share"))
      .orderBy("region", "rank_in_region")
  }

  /** q261: per-brand price box-plot mart — grouped EXACT quartiles
    * (p25/median/p75), IQR, and Tukey-fence outlier counts over
    * lineitem extended prices, the distribution panel a pricing
    * dashboard renders per brand. The q258 bucketed-CDF argument,
    * GROUPED: quantiles come from the per-brand cents histogram
    * (grouped running sum + integer cross-multiplied thresholds
    * cum·4 ≥ n / cum·2 ≥ n / cum·4 ≥ 3n), never a per-row rank; the
    * Tukey fences are kept integral by scaling the 1.5·IQR test by 2
    * (2·cents vs 2·q ± 3·IQR), so the only IEEE ops are the final
    * cents→dollars formatting divisions.
    *
    * Scale: one fact shuffle to (brand, cents) grain (map-side
    * combined); everything after runs on the histogram, and the
    * outlier pass joins the 25-row quartile table back broadcast. */
  def brandPriceBoxplot(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val hist = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        cents2(col("l_extendedprice")).as("cents"))
      .groupBy("brand", "cents")
      .agg(count(lit(1)).as("c"))
    val byBrand = Window.partitionBy("brand").orderBy("cents")
    val q = hist
      .withColumn("cum", sum("c").over(
        byBrand.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("brand")))
      .groupBy("brand")
      .agg(max("n").as("n_items"),
        min(when(col("cum") * 4 >= col("n"), col("cents"))).as("q1c"),
        min(when(col("cum") * 2 >= col("n"), col("cents"))).as("q2c"),
        min(when(col("cum") * 4 >= col("n") * 3, col("cents")))
          .as("q3c"))
    val outliers = hist.join(broadcast(q), "brand")
      .groupBy("brand")
      .agg(coalesce(sum(when(
        col("cents") * 2 < col("q1c") * 2 - (col("q3c") - col("q1c")) * 3
          || col("cents") * 2 >
            col("q3c") * 2 + (col("q3c") - col("q1c")) * 3,
        col("c"))), lit(0L)).as("n_outliers"))
    q.join(outliers, "brand")
      .select(col("brand"), col("n_items"),
        (col("q1c").cast("double") / lit(100.0)).as("p25"),
        (col("q2c").cast("double") / lit(100.0)).as("median"),
        (col("q3c").cast("double") / lit(100.0)).as("p75"),
        ((col("q3c") - col("q1c")).cast("double") / lit(100.0)).as("iqr"),
        col("n_outliers"))
      .orderBy("brand")
  }

  /** q262: repeat-purchase survival — the Nelson–Aalen cumulative
    * hazard of converting a first purchase into a second, the curve
    * behind "how long until a new customer comes back" and churn-
    * horizon policies. Per user: time zero = first purchase; event =
    * second purchase at day (t2−t1)/86400s; users with one purchase
    * are right-censored at the last observed purchase timestamp.
    * Risk sets come from the day-grain endpoint histogram (descending
    * running sum), so after the one user-grain reduction everything is
    * metadata-sized (≤ corpus-span days).
    *
    * Determinism: days are exact integer µs divisions; each hazard
    * term is floor-scaled to integer NANO-hazard before the running
    * sum (no float accumulation anywhere — the float sum order an
    * engine pair can't agree on is exactly what this avoids), and the
    * cumulative hazard is one final integer/1e9 division. */
  def repeatPurchaseHazard(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val users = p.withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 2)
      .groupBy("user_id")
      .agg(min(when(col("rn") === 1, col("us"))).as("t1"),
        min(when(col("rn") === 2, col("us"))).as("t2"))
    val obsEnd = p.agg(max("us").as("end_us"))
    val hist = users.crossJoin(broadcast(obsEnd))
      .select(
        expr(s"CASE WHEN t2 IS NOT NULL THEN (t2 - t1) DIV $dayUs END")
          .as("event_day"),
        expr(s"CASE WHEN t2 IS NULL THEN (end_us - t1) DIV $dayUs END")
          .as("censor_day"))
      .groupBy(coalesce(col("event_day"), col("censor_day")).as("day"))
      .agg(count(lit(1)).as("ended"),
        sum(when(col("event_day").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
    hist
      .withColumn("n_risk", sum("ended").over(Window.orderBy(desc("day"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("n_converted") > 0)
      .withColumn("nano_h", expr("(n_converted * 1000000000) DIV n_risk"))
      .withColumn("cum_nano", sum("nano_h").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("day"), col("n_risk"), col("n_converted"),
        val6(col("n_converted").cast("double") /
          col("n_risk").cast("double")).as("hazard"),
        (col("cum_nano").cast("double") / lit(1.0e9)).as("cum_hazard"))
      .orderBy("day")
  }

  /** q263: weekly purchase-conversion rate with WILSON 95% bounds —
    * the interval a rate dashboard should draw instead of ±z·se
    * (Wilson stays inside [0,1] and behaves at small n; Wilson 1927,
    * Brown–Cai–DasGupta 2001). Per week: n = distinct active users,
    * k = distinct purchasers, both exact distincts off one pass.
    *
    * Portability: the bound is one fixed-shape expression over the two
    * exact integers — divisions, one multiply chain, and sqrt, all
    * correctly-rounded IEEE ops stated in the SAME tree shape on both
    * engines (the q253 discipline), then [[val6]]. */
  def weeklyConversionWilson(spark: SparkSession, dir: String)
      : DataFrame = {
    val g = Tables.events(spark, dir)
      .select(trunc(to_date(col("ts")), "week").as("week"),
        col("user_id"), col("event_type"))
      .groupBy("week")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "purchase",
          col("user_id"))).as("n_buyers"))
    val (phat, lo, hi) = wilson(col("n_users"), col("n_buyers"))
    g.select(col("week"), col("n_users"), col("n_buyers"),
        val6(phat).as("conversion"),
        val6(lo).as("wilson_lo"),
        val6(hi).as("wilson_hi"))
      .orderBy("week")
  }

  /** The Wilson 95% tree shared by q263/q274 — one fixed expression
    * shape over exact (n, k) integers; every oracle states the SAME
    * tree verbatim (all ops correctly-rounded IEEE). */
  private def wilson(nc: Column, kc: Column)
      : (Column, Column, Column) = {
    def d(c: Column) = c.cast("double")
    val n = d(nc)
    val k = d(kc)
    val z = lit(1.96)
    val z2 = lit(1.96) * lit(1.96)
    val phat = k / n
    val denom = lit(1.0) + z2 / n
    val center = (phat + z2 / (lit(2.0) * n)) / denom
    val half = z * sqrt(phat * (lit(1.0) - phat) / n
      + z2 / (lit(4.0) * n * n)) / denom
    (phat, center - half, center + half)
  }

  /** q264: brand market-share shift — monthly revenue share per brand
    * with its month-over-month share delta and rank movement, the
    * "who's winning" mart a category manager reads. One fact shuffle
    * to (month, brand) grain; the share/rank windows run on that
    * |months|×|brands| table and the lag chain keys on brand (delta is
    * vs the previous OBSERVED month for the brand).
    *
    * Exactness: integer-cents revenue; each share is one IEEE
    * division and the delta one subtraction of two such divisions,
    * rounded via [[val6]]; rank moves are pure integers. */
  def brandShareShift(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val m = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(trunc(col("l_shipdate"), "month").as("month"),
        col("p_brand").as("brand"))
      .agg(sum(cents2(col("l_extendedprice"))).as("cents"))
    val byBrand = Window.partitionBy("brand").orderBy("month")
    val share = col("cents").cast("double") / col("mtot").cast("double")
    val prevShare =
      col("prev_cents").cast("double") / col("prev_mtot").cast("double")
    m.withColumn("mtot", sum("cents").over(Window.partitionBy("month")))
      .withColumn("rank_in_month", row_number().over(
        Window.partitionBy("month").orderBy(desc("cents"), col("brand")))
        .cast("long"))
      .withColumn("prev_cents", lag("cents", 1).over(byBrand))
      .withColumn("prev_mtot", lag("mtot", 1).over(byBrand))
      .withColumn("prev_rank", lag("rank_in_month", 1).over(byBrand))
      .select(col("month"), col("brand"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        val6(share).as("share"),
        col("rank_in_month"),
        when(col("prev_cents").isNotNull, val6(share - prevShare))
          .as("share_delta"),
        (col("prev_rank") - col("rank_in_month")).as("rank_move"))
      .orderBy("month", "brand")
  }

  /** q265: funnel stage-latency quantiles — how long users take
    * between their FIRST touch of consecutive lifecycle stages
    * (signup→view→click→purchase), the "where does the funnel stall"
    * companion to the q09/q18 stage-count funnels. Per user, one
    * aggregate pivots first-touch timestamps wide; each adjacent pair
    * with a non-negative gap contributes one exact-µs latency; the
    * quantiles come from the per-pair hour-grain bucketed CDF with
    * integer cross-multiplied thresholds (the q258/q261 discipline —
    * nothing ranks at data grain).
    *
    * Latencies where the later stage was first touched EARLIER are
    * excluded (stated contract: out-of-order journeys measure a
    * different thing), as is any pair the user never completed. */
  def funnelStageLatency(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    def firstOf(t: String) =
      min(when(col("event_type") === t, us)).as(s"t_$t")
    val wide = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(firstOf("signup"), firstOf("view"), firstOf("click"),
        firstOf("purchase"))
    val pairs = Seq(("signup", "view"), ("view", "click"),
      ("click", "purchase"))
    val lat = wide.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(s"${a}_to_$b").as("stage_pair"),
          (col(s"t_$b") - col(s"t_$a")).as("gap_us"))
      }: _*)).as("x"))
      .select(col("x.stage_pair").as("stage_pair"),
        col("x.gap_us").as("gap_us"))
      .filter(col("gap_us").isNotNull && col("gap_us") >= 0)
    val b = lat
      .groupBy(col("stage_pair"), expr("gap_us DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("c"), sum("gap_us").as("s"))
    val byPair = Window.partitionBy("stage_pair").orderBy("h")
    b.withColumn("cum", sum("c").over(
        byPair.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("stage_pair")))
      .withColumn("sus", sum("s").over(Window.partitionBy("stage_pair")))
      .groupBy("stage_pair")
      .agg(max("n").as("n_users"),
        min(when(col("cum") * 2 >= col("n"), col("h")))
          .as("median_hours"),
        min(when(col("cum") * 10 >= col("n") * 9, col("h")))
          .as("p90_hours"),
        max("sus").as("sus"))
      .select(col("stage_pair"), col("n_users"), col("median_hours"),
        col("p90_hours"),
        val6(col("sus").cast("double") / col("n_users").cast("double")
          / lit(3600000000.0)).as("mean_hours"))
      .orderBy("stage_pair")
  }

  /** q266: comparable-parts revenue index — the month-over-month
    * growth index retailers quote as "like-for-like sales": for each
    * month, the revenue ratio vs the previous CALENDAR month computed
    * only over parts sold in BOTH (new and delisted parts excluded,
    * so assortment churn doesn't masquerade as growth), plus how much
    * of the month's revenue the comparable set covers.
    *
    * One fact shuffle to (month, part) cents grain; the lag chain
    * keys on part with an integer month-index adjacency test; the
    * month-grain rollup and its one division per ratio are exact. */
  def comparableRevenueIndex(spark: SparkSession, dir: String)
      : DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"))
    val m = Tables.lineitem(spark, dir)
      .groupBy(trunc(col("l_shipdate"), "month").as("month"),
        col("l_partkey"))
      .agg(sum(cents2(col("l_extendedprice"))).as("cents"))
      .withColumn("mi",
        year(col("month")) * 12 + month(col("month")))
    val byPart = Window.partitionBy("l_partkey").orderBy("mi")
    val lagged = m
      .withColumn("prev_cents", lag("cents", 1).over(byPart))
      .withColumn("prev_mi", lag("mi", 1).over(byPart))
      .withColumn("comparable",
        col("prev_mi").isNotNull && col("prev_mi") === col("mi") - 1)
    lagged.groupBy("month")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("comparable"), 1L).otherwise(0L))
          .as("n_comparable"),
        sum("cents").as("tot_cents"),
        sum(when(col("comparable"), col("cents"))).as("comp_cents"),
        sum(when(col("comparable"), col("prev_cents")))
          .as("comp_prev_cents"))
      .filter(col("n_comparable") > 0)
      .select(col("month"), col("n_parts"), col("n_comparable"),
        (col("tot_cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("comp_cents").cast("double") /
          col("comp_prev_cents").cast("double")).as("index_mom"),
        val6(col("comp_cents").cast("double") /
          col("tot_cents").cast("double")).as("coverage"))
      .orderBy("month")
  }

  /** q267: demand-trend movers — the top-20 parts whose DAILY demand
    * is accelerating, by exact per-part OLS slope of quantity over
    * the ship-day index (the q102 integer-power-sum discipline, per
    * key): one map-side-combined aggregate collects (n, Σx, Σy, Σxy,
    * Σx²) as BIGINTs (y = quantity in hundredths, x = days from the
    * corpus's first ship date), then slope = (n·Σxy − Σx·Σy) /
    * (n·Σx² − Σx·Σx) is one division, reported per 30 days. Ranking
    * is over the computed double (bit-identical on both engines)
    * with partkey tiebreak; nothing leaves part grain until the
    * top-k. At 100 TB the power sums would ride DECIMAL(38) — the
    * shape (one aggregate, top-k) is unchanged. */
  def demandTrendMovers(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame = {
    val anchor = Tables.lineitem(spark, dir)
      .agg(min(col("l_shipdate")).as("d0"))
    val sums = Tables.lineitem(spark, dir)
      .crossJoin(broadcast(anchor))
      .select(col("l_partkey"),
        datediff(col("l_shipdate"), col("d0")).cast("long").as("x"),
        cents2(col("l_quantity")).as("y"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2 &&
        col("n") * col("sxx") - col("sx") * col("sx") > 0)
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") * lit(30.0) /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    sums
      .withColumn("slope_30d", val6(slope / lit(100.0)))
      // distributed top-k (TakeOrderedAndProject), THEN rank the k
      // survivors — never a global single-partition sort at part grain
      .orderBy(desc("slope_30d"), col("l_partkey")).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(
        desc("slope_30d"), col("l_partkey"))).cast("long"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("rank"), col("l_partkey").as("partkey"),
        col("p_brand").as("brand"), col("n").as("n_lines"),
        (col("sy").cast("double") / lit(100.0)).as("total_qty"),
        col("slope_30d"))
      .orderBy("rank")
  }

  /** Shared core for the two-sample distribution tests (q268/q269):
    * order-value cents histogram split by two customer segments, with
    * BOTH groups' cumulative counts advanced over the same value order
    * through ONE two-phase distributed prefix-sum
    * ([[Relational.globalRankedPrefixSums]] — no single-partition
    * window anywhere, and the histogram is checkpointed once). */
  private def segmentCentsCdf(spark: SparkSession, dir: String,
      segA: String, segB: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val hist = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(segA, segB))
      .select((col("c_mktsegment") === lit(segA)).as("is_a"),
        cents2(col("o_totalprice")).as("cents"))
      .groupBy("cents")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
      // cents are positive: a 19-digit zero-pad makes the range
      // partitioning's lexicographic order the numeric order
      .withColumn("_k", lpad(col("cents").cast("string"), 19, "0"))
    Relational.globalRankedPrefixSums(hist, "_k",
      Seq("c" -> "cum", "c1" -> "cum1"), "_r")
  }

  /** q268: Mann–Whitney rank-sum test — does one customer segment
    * spend stochastically more per order than another? The
    * nonparametric two-sample test a skewed money distribution calls
    * for (a t-test's mean is the wrong summary under heavy tails).
    * Exactness at scale: ranks never materialize per row — the
    * histogram grain carries tie counts, midranks double-scale to
    * stay integral (2·midrank = 2·cum_before + t + 1), so the rank
    * sum, U, and the tie-corrected variance all come from exact
    * BIGINTs; z is one fixed-shape IEEE tree mirrored in the oracle.
    * (Power sums can reach ~n·2N — at extreme corpus sizes the sums
    * would ride DECIMAL(38), same shape.) */
  def rankSumTest(spark: SparkSession, dir: String,
      segA: String = "BUILDING", segB: String = "MACHINERY")
      : DataFrame = {
    val g = segmentCentsCdf(spark, dir, segA, segB)
      .agg(sum("c1").as("n1"), sum("c2").as("n2"),
        sum(col("c1") * ((col("cum") - col("c")) * 2 + col("c") + 1))
          .as("r1x2"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
    def d(c: Column) = c.cast("double")
    val u1x2 = col("r1x2") - col("n1") * (col("n1") + 1)
    val nn = col("n1") + col("n2")
    val varU = d(col("n1")) * d(col("n2")) / lit(12.0) *
      ((d(nn) + lit(1.0)) -
        d(col("ties")) / (d(nn) * (d(nn) - lit(1.0))))
    val z = d(u1x2 - col("n1") * col("n2")) / (lit(2.0) * sqrt(varU))
    g.select(col("n1"), col("n2"),
      (d(u1x2) / lit(2.0)).as("u_stat"),
      val6(d(u1x2) / (lit(2.0) * d(col("n1")) * d(col("n2"))))
        .as("p_superior"),
      val6(z).as("z"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** q269: two-sample Kolmogorov–Smirnov D — the distribution-shape
    * companion to q268's location test, and FULLY integer until the
    * final divisions: D = max |F1 − F2| is found as the exact BIGINT
    * max of |cum1·n2 − cum2·n1| over the shared CDF grain (no float
    * compare decides the argmax), then divided once by n1·n2; the
    * 5% critical value is 1.358·√((n1+n2)/(n1·n2)) — sqrt is
    * correctly-rounded IEEE, the q263 discipline. */
  def ksTest(spark: SparkSession, dir: String,
      segA: String = "BUILDING", segB: String = "MACHINERY")
      : DataFrame = {
    val cdf = segmentCentsCdf(spark, dir, segA, segB)
      .withColumn("cum2", col("cum") - col("cum1"))
    val tot = cdf.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val g = cdf.crossJoin(broadcast(tot))
      .agg(
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
          .as("d_x"),
        max("n1").as("n1"), max("n2").as("n2"))
    def d(c: Column) = c.cast("double")
    val dStat = d(col("d_x")) / (d(col("n1")) * d(col("n2")))
    val dCrit = lit(1.358) *
      sqrt((d(col("n1")) + d(col("n2"))) /
        (d(col("n1")) * d(col("n2"))))
    g.select(col("n1"), col("n2"),
      val6(dStat).as("d_stat"),
      val6(dCrit).as("d_crit_05"),
      (dStat > dCrit).as("significant"))
  }

  /** q270: cohort LTV curve — the money companion to q66's retention
    * matrix: cumulative purchase revenue per (first-purchase-week
    * cohort, weeks-since), normalized per cohort user. One user-grain
    * cohort aggregate, one user⋈user co-partitioned join (AQE reuses
    * the first aggregation's exchange), and the cumulative window
    * runs per cohort over ≤ corpus-span/7 rows. Exact cents
    * throughout; LTV is (cum/100)/n — two IEEE divisions in a fixed
    * tree, [[val6]]-scaled. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        cents2(col("value")).as("cents"))
    val cohort = p.groupBy("user_id")
      .agg(min("day").as("first_day"))
      .select(col("user_id"),
        trunc(col("first_day"), "week").as("cohort_week"))
    val size = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    val cells = p.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(trunc(col("day"), "week"), col("cohort_week")) / 7)
          .cast("int").as("weeks_since"))
      .agg(sum("cents").as("cents"))
    val wCum = Window.partitionBy("cohort_week").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(size), "cohort_week")
      .withColumn("cum_cents", sum("cents").over(wCum))
      .select(col("cohort_week"), col("weeks_since"), col("n_users"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (col("cum_cents").cast("double") / lit(100.0)).as("cum_revenue"),
        val6(col("cum_cents").cast("double") / lit(100.0) /
          col("n_users").cast("double")).as("ltv_per_user"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** q271: ABC inventory classification — parts bucketed A/B/C by
    * cumulative revenue share (A ≤ 80%, B ≤ 95%, C the tail), the
    * assortment-policy table behind stocking and delisting decisions.
    * The descending revenue rank AND the running revenue both come
    * from ONE two-phase [[Relational.globalRankedPrefixSum]] on a
    * (revenue DESC, partkey) lexicographic key — no single-partition
    * sort at part grain anywhere; the grand total is the LAST
    * cumulative value (max), so no second fact pass exists. Class
    * cuts are integer cross-multiplications (cum·5 ≤ tot·4). */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(cents2(col("l_extendedprice"))).as("cents"))
    val keyed = rev.withColumn("_k", concat(
      lpad((lit(1000000000000000000L) - col("cents")).cast("string"),
        19, "0"),
      lpad(col("l_partkey").cast("string"), 19, "0")))
    val ranked = Relational.globalRankedPrefixSum(
      keyed, "_k", "cents", "rank", "cum_cents")
    val tot = ranked.agg(max("cum_cents").as("tot"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("cum_cents") * 5 <= col("tot") * 4, "A")
          .when(col("cum_cents") * 20 <= col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum("cents").as("class_cents"),
        max("tot").as("tot"),
        min("rank").as("rank_from"), max("rank").as("rank_to"))
      .select(col("abc_class"), col("n_parts"),
        (col("class_cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("class_cents").cast("double") /
          col("tot").cast("double")).as("revenue_share"),
        col("rank_from"), col("rank_to"))
      .orderBy("abc_class")
  }

  /** q272: basket-size dispersion — is the per-order item count
    * Poisson-like or clumped? Index of dispersion (variance/mean) per
    * order priority from exact BIGINT power sums (the q82/q102
    * discipline): one orderkey-grain count, one co-partitioned join
    * to priorities, one 5-row aggregate; every ratio is a fixed IEEE
    * tree over exact integers. */
  def basketDispersion(spark: SparkSession, dir: String): DataFrame = {
    val k = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
    val pri = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val g = k.join(pri, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum("k").as("sk"),
        sum(col("k") * col("k")).as("skk"))
    def d(c: Column) = c.cast("double")
    val mean = d(col("sk")) / d(col("n_orders"))
    val vr = d(col("n_orders") * col("skk") - col("sk") * col("sk")) /
      (d(col("n_orders")) * (d(col("n_orders")) - lit(1.0)))
    g.select(col("o_orderpriority").as("priority"), col("n_orders"),
        val6(mean).as("mean_items"),
        val6(vr).as("var_items"),
        val6(vr / mean).as("dispersion"),
        (vr / mean > lit(1.0)).as("overdispersed"))
      .orderBy("priority")
  }

  /** q273: new-vs-returning revenue decomposition — each month's
    * revenue and customer counts split by whether the customer's FIRST
    * order falls in that month, the growth-accounting mart behind
    * "is growth acquisition or retention". One customer-grain first-
    * month aggregate, one customer⋈customer co-partitioned join (AQE
    * reuses the aggregation exchange), exact cents, one division per
    * share. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        trunc(to_date(col("o_orderdate")), "month").as("month"),
        cents2(col("o_totalprice")).as("cents"))
    val first = o.groupBy("o_custkey")
      .agg(min("month").as("first_month"))
    val isNew = col("month") === col("first_month")
    o.join(first, "o_custkey")
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(when(isNew, col("o_custkey")))
          .as("n_new_customers"),
        sum(when(isNew, col("cents")).otherwise(0L)).as("new_cents"),
        sum("cents").as("tot_cents"))
      .select(col("month"), col("n_orders"), col("n_customers"),
        col("n_new_customers"),
        (col("tot_cents").cast("double") / lit(100.0)).as("revenue"),
        (col("new_cents").cast("double") / lit(100.0)).as("new_revenue"),
        val6(col("new_cents").cast("double") /
          col("tot_cents").cast("double")).as("new_share"))
      .orderBy("month")
  }

  /** q274: session entry-type conversion — conversion rate of sessions
    * by their FIRST event type (the landing-page question), with the
    * q263 Wilson bounds per entry type. Sessionization is the q17
    * window; the per-session reduction rides ONE (user, session)
    * aggregate whose entry event is `min(struct(ts, event_id, type))`
    * — no second window pass — and the final grain is ≤|types| rows. */
  def entryTypeConversion(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("new_session",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1)
          .over(byUser) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val perSession = sess.groupBy("user_id", "session_id")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
        .as("first_ev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .select(col("first_ev.event_type").as("entry_type"),
        col("converted"))
    val g = perSession.groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum("converted").as("n_converted"))
    val (phat, lo, hi) = wilson(col("n_sessions"), col("n_converted"))
    g.select(col("entry_type"), col("n_sessions"), col("n_converted"),
        val6(phat).as("conversion"),
        val6(lo).as("wilson_lo"),
        val6(hi).as("wilson_hi"))
      .orderBy("entry_type")
  }

  /** q275: spend-quartile migration matrix — customers re-scored in
    * the second half of the corpus against the FIRST half's quartile
    * rubric (fixed cuts, so movement is absolute, not relative), plus
    * tier 0 for customers absent from a half — the
    * upgraded/downgraded/churned/acquired table a lifecycle program
    * reads. The rubric comes from the first-half cents histogram via
    * the two-phase [[Relational.globalRankedPrefixSum]] (no
    * single-partition sort; cuts are integer cross-multiplications);
    * scoring is a broadcast join of 1 row of cuts; the matrix is a
    * full-outer customer⋈customer join at ≤ 5×5 output grain. */
  def spendQuartileMigration(spark: SparkSession, dir: String)
      : DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        cents2(col("o_totalprice")).as("cents"))
    val bounds = o.agg(min("day").as("d0"), max("day").as("d1"))
    val spend = o.crossJoin(broadcast(bounds))
      .withColumn("h",
        when(datediff(col("day"), col("d0")) * 2 <=
          datediff(col("d1"), col("d0")), 1).otherwise(2))
      .groupBy(col("o_custkey"), col("h"))
      .agg(sum("cents").as("cents"))
    val hist = spend.filter(col("h") === 1)
      .groupBy("cents").agg(count(lit(1)).as("c"))
      .withColumn("_k", lpad(col("cents").cast("string"), 19, "0"))
    // the two references to `ranked` re-execute only the cheap
    // post-checkpoint window+offset-join lineage, not the scan
    val ranked = Relational
      .globalRankedPrefixSum(hist, "_k", "c", "_r", "cum")
    val cuts = ranked
      .crossJoin(broadcast(ranked.agg(max("cum").as("n"))))
      .agg(min(when(col("cum") * 4 >= col("n"), col("cents"))).as("q1"),
        min(when(col("cum") * 2 >= col("n"), col("cents"))).as("q2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("cents")))
          .as("q3"))
    val scored = spend.crossJoin(broadcast(cuts))
      .select(col("o_custkey"), col("h"),
        when(col("cents") <= col("q1"), 1)
          .when(col("cents") <= col("q2"), 2)
          .when(col("cents") <= col("q3"), 3).otherwise(4).as("tier"))
    val t1 = scored.filter(col("h") === 1)
      .select(col("o_custkey"), col("tier").as("tier_h1"))
    val t2 = scored.filter(col("h") === 2)
      .select(col("o_custkey"), col("tier").as("tier_h2"))
    val m = t1.join(t2, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("tier_h1"), lit(0)).as("tier_h1"),
        coalesce(col("tier_h2"), lit(0)).as("tier_h2"))
      .groupBy("tier_h1", "tier_h2")
      .agg(count(lit(1)).as("n_customers"))
    m.crossJoin(broadcast(m.agg(sum("n_customers").as("tot"))))
      .select(col("tier_h1"), col("tier_h2"), col("n_customers"),
        val6(col("n_customers").cast("double") /
          col("tot").cast("double")).as("share"))
      .orderBy("tier_h1", "tier_h2")
  }

  /** q279: frequent brand TRIPLES — the 3-itemset extension of q68's
    * pair mining (bundle design needs triads, not just pairs). The
    * candidate expansion is IN-ROW (three chained explodes over the
    * sorted, [[MaxBasketWidth]]-capped basket with a<b<c masks), so
    * per-order work is bounded by cap³ regardless of basket skew and
    * map-side combine reduces to the ≤|brands|³ key domain before any
    * shuffle; the oracle proves the expansion against a relational
    * 3-way self-join. */
  def brandTriples(spark: SparkSession, dir: String,
      minSupport: Long = 4): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("p_brand"))),
        1, MaxBasketWidth).as("bs"))
    baskets
      .select(explode(col("bs")).as("brand_a"), col("bs"))
      .select(col("brand_a"), explode(col("bs")).as("brand_b"),
        col("bs"))
      .filter(col("brand_a") < col("brand_b"))
      .select(col("brand_a"), col("brand_b"),
        explode(col("bs")).as("brand_c"))
      .filter(col("brand_b") < col("brand_c"))
      .groupBy("brand_a", "brand_b", "brand_c")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy("brand_a", "brand_b", "brand_c")
  }

  /** q280: next-order brand transitions — which brand a customer's
    * NEXT order leads with, the cross-sell sequencing table (q123's
    * Markov idea lifted from event types to purchase content). Each
    * order is represented by its highest-value lineitem's brand
    * (ties: lowest partkey); the lead chain keys on customer; top-20
    * via distributed TakeOrderedAndProject with rank assigned after
    * the limit (the q267 discipline). */
  def brandTransitions(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame = {
    val rep = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"),
        cents2(col("l_extendedprice")).as("cents"), col("l_partkey"))
      .withColumn("rn", row_number().over(Window
        .partitionBy("l_orderkey")
        .orderBy(desc("cents"), col("l_partkey"))))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("p_brand"))
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("day"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("day"))
      .join(rep, col("o_orderkey") === col("l_orderkey"))
      .withColumn("next_brand", lead("p_brand", 1).over(byCust))
      .filter(col("next_brand").isNotNull)
      .groupBy(col("p_brand").as("from_brand"),
        col("next_brand").as("to_brand"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("from_brand"), col("to_brand"))
      .limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(
        desc("n"), col("from_brand"), col("to_brand"))).cast("long"))
      .select(col("rank"), col("from_brand"), col("to_brand"), col("n"))
      .orderBy("rank")
  }

  /** q281: chi-square independence test + Cramér's V over the
    * (market segment × order priority) contingency table — "does
    * segment drive priority mix", the categorical companion to
    * q268/q269. Portability device: each cell's χ² term is computed
    * as ONE fixed IEEE tree over exact integers (diff = o·N − r·c is
    * exact BIGINT arithmetic) and floor-scaled to integer NANOS
    * before summing, so the cross-cell accumulation is an
    * order-independent integer sum — the float-sum-order hazard a
    * 25-cell Σ would otherwise carry. (At extreme corpus sizes o·N
    * would ride DECIMAL(38); same shape.) The cell grid is DENSIFIED
    * (distinct segs × distinct pris, observed coalesced to 0) so an
    * empty cell contributes its expected mass r·c/N — the textbook
    * statistic, not the observed-cells-only understatement. The
    * 5%-level verdict is
    * stated only for the fixture's dof=16 table (literal critical
    * value 26.296); other shapes emit NULL rather than a wrong
    * threshold. */
  def chiSquareIndependence(spark: SparkSession, dir: String)
      : DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val observed = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("o"))
    // Densify: an EMPTY (seg, pri) cell still contributes its expected
    // count e = r·c/N to the statistic (its χ² term is (0−e)²/e = e).
    // The grid is bounded metadata (distinct segs × distinct pris —
    // 25 cells on this schema), so the cross join is broadcast-safe.
    val cells = observed.select("seg").distinct()
      .crossJoin(broadcast(observed.select("pri").distinct()))
      .join(observed, Seq("seg", "pri"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    def d(x: Column) = x.cast("double")
    val diff = d(col("o") * col("n") - col("r") * col("c"))
    val termNano = floor(diff * diff /
      (d(col("n")) * d(col("r")) * d(col("c"))) * lit(1.0e9))
      .cast("long")
    val g = cells
      .withColumn("r", sum("o").over(Window.partitionBy("seg")))
      .withColumn("c", sum("o").over(Window.partitionBy("pri")))
      .withColumn("n", sum("o").over(Window.partitionBy(lit(1))))
      .withColumn("tn", termNano)
      .agg(sum("tn").as("chi_nano"), max("n").as("n"),
        countDistinct("seg").as("nr"), countDistinct("pri").as("nc"))
    val chi2 = d(col("chi_nano")) / lit(1.0e9)
    val dof = (col("nr") - 1) * (col("nc") - 1)
    val v = sqrt(chi2 / d(col("n") * least(col("nr") - 1,
      col("nc") - 1)))
    g.select(col("n").as("n_orders"), col("nr").as("n_segments"),
      col("nc").as("n_priorities"), dof.as("dof"),
      val6(chi2).as("chi2"), val6(v).as("cramers_v"),
      when(dof === 16, chi2 > lit(26.296)).as("significant_05"))
  }

  /** q282: segment × brand affinity — which customer segments
    * over-index on which brands, the merchandising targeting mart:
    * lift = observed·N / (rowTotal·colTotal) over the (segment,
    * brand) purchase-line contingency, top-20 by lift above a
    * support floor. All counts exact BIGINTs from one fact pass
    * (orderkey-co-partitioned orders join, broadcast dims); lift is
    * one fixed tree per row; top-k via TakeOrderedAndProject, rank
    * after the limit (the q267 discipline). Ordering ties on the
    * val6-rounded lift break lexically. */
  def segmentBrandAffinity(spark: SparkSession, dir: String,
      minSupport: Long = 50, topK: Int = 20): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val cells = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("p_brand").as("brand"))
      .agg(count(lit(1)).as("o"))
    val lift = val6(col("o").cast("double") * col("n").cast("double") /
      (col("r").cast("double") * col("c").cast("double")))
    cells
      .withColumn("r", sum("o").over(Window.partitionBy("segment")))
      .withColumn("c", sum("o").over(Window.partitionBy("brand")))
      .withColumn("n", sum("o").over(Window.partitionBy(lit(1))))
      .filter(col("o") >= minSupport)
      .withColumn("lift", lift)
      .orderBy(desc("lift"), col("segment"), col("brand")).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(
        desc("lift"), col("segment"), col("brand"))).cast("long"))
      .select(col("rank"), col("segment"), col("brand"),
        col("o").as("n_lines"), col("lift"))
      .orderBy("rank")
  }

  /** q283: power-of-two order-value histogram — the log-scale money
    * distribution panel, EXACT without any float log: the bucket is
    * the bit length of the integer cents (length(bin(x)) − 1 =
    * ⌊log₂ x⌋ on both engines), bucket bounds are integer shifts.
    * One map-side-combined aggregate to ≤64 buckets. */
  def valueHistogramLog2(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(cents2(col("o_totalprice")).as("cents"))
      .filter(col("cents") > 0)
      .groupBy((length(bin(col("cents"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents"))
    g
      .withColumn("tot", sum("n_orders").over(Window.partitionBy(lit(1))))
      .select(col("bucket"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
          .cast("double") / lit(100.0)).as("lo_dollars"),
        col("n_orders"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("n_orders").cast("double") / col("tot").cast("double"))
          .as("share"))
      .orderBy("bucket")
  }

  /** q284: acquisition-cohort repeat rate — per first-order month:
    * how many of that month's new customers EVER ordered again, with
    * the q263 Wilson bounds (cohort sizes shrink at the edges — the
    * interval matters). One customer-grain aggregate (first month +
    * order count), one month-grain rollup. */
  def cohortRepeatRate(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        trunc(to_date(col("o_orderdate")), "month").as("month"))
      .groupBy("o_custkey")
      .agg(min("month").as("cohort_month"),
        count(lit(1)).as("n_orders"))
      .groupBy("cohort_month")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
          .as("n_repeaters"))
    val (phat, lo, hi) = wilson(col("n_customers"), col("n_repeaters"))
    g.select(col("cohort_month"), col("n_customers"),
        col("n_repeaters"),
        val6(phat).as("repeat_rate"),
        val6(lo).as("wilson_lo"),
        val6(hi).as("wilson_hi"))
      .orderBy("cohort_month")
  }

  /** q285: discount-depth response curve — per integer discount
    * percent: line share, exact average quantity, and revenue — the
    * "does discounting move volume" readout. One map-side-combined
    * aggregate to the ≤101-band grain; avg is one exact-int ratio. */
  def discountResponse(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(spark, dir)
      .select(
        floor(col("l_discount") * 100.0 + 0.5).cast("long").as("pct"),
        cents2(col("l_quantity")).as("qc"),
        cents2(col("l_extendedprice")).as("cents"))
      .groupBy("pct")
      .agg(count(lit(1)).as("n_lines"), sum("qc").as("sq"),
        sum("cents").as("sc"))
    g.withColumn("tot", sum("n_lines").over(Window.partitionBy(lit(1))))
      .select(col("pct"), col("n_lines"),
        val6(col("n_lines").cast("double") / col("tot").cast("double"))
          .as("line_share"),
        val6(col("sq").cast("double") / lit(100.0) /
          col("n_lines").cast("double")).as("avg_qty"),
        (col("sc").cast("double") / lit(100.0)).as("revenue"))
      .orderBy("pct")
  }

  /** The EWMA lag-chain core shared by q250 and the q251 continuous
    * monitor: `d` must carry integer `cents` at (partCols, day) grain;
    * emits forecast/flag per row (first observed day per partition is
    * dropped — no history). */
  private[graft] def ewmaFrom(d: DataFrame,
      partCols: Seq[String]): DataFrame = {
    val window = 8
    val w = Window.partitionBy(partCols.map(col): _*).orderBy("day")
    val terms = (1 to window).map { k =>
      val wt = 1L << (window - k)
      (coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(wt),
        when(lag(col("cents"), k).over(w).isNotNull, lit(wt))
          .otherwise(lit(0L)))
    }
    d
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .filter(col("den") > 0)
      .select(partCols.map(col) ++ Seq(col("day"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        val6(col("num").cast("double") / col("den").cast("double")
          / lit(100.0)).as("forecast"),
        when(col("cents") * lit(2) * col("den") > col("num") * lit(3),
          lit("high"))
          .when(col("cents") * lit(2) * col("den") < col("num"),
            lit("low"))
          .otherwise(lit("ok")).as("flag")): _*)
  }

  /** q295 — HITS hubs & authorities (Kleinberg) over the q280
    * brand-transition graph: a brand is a strong HUB when customers
    * move FROM it to strong authorities, a strong AUTHORITY when
    * strong hubs feed INTO it — the two-sided centrality PageRank's
    * single score can't express (a gateway brand and a destination
    * brand look the same to PageRank's inflow-only view).
    *
    * Determinism (q111's fixed-point discipline, adapted to HITS's
    * normalization): edge weights become per-source transition
    * probabilities in micro-units (n·10⁶ div out), scores live in
    * micro-units, each half-step floors per edge BEFORE the
    * order-independent integer sum, and each round renormalizes by
    * the round's max (raw·10⁶ div max) — so every value is bounded by
    * the VOCABULARY (≤10⁶·|V| intermediate), never the data size, at
    * any scale, and both engines produce identical BIGINTs.
    *
    * Scale: the edge derivation is q280's — one representative-item
    * window + one lead over (customer, day) — and the iterations are
    * joins over the |V|²-bounded probability table: vocabulary-grain
    * metadata work after one corpus pass. */
  def brandHits(spark: SparkSession, dir: String,
      iters: Int = 2): DataFrame = {
    val rep = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"),
        cents2(col("l_extendedprice")).as("cents"), col("l_partkey"))
      .withColumn("rn", row_number().over(Window
        .partitionBy("l_orderkey")
        .orderBy(desc("cents"), col("l_partkey"))))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("p_brand"))
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("day"), col("o_orderkey"))
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("day"))
      .join(rep, col("o_orderkey") === col("l_orderkey"))
      .withColumn("next_brand", lead("p_brand", 1).over(byCust))
      .filter(col("next_brand").isNotNull)
      .groupBy(col("p_brand").as("from_brand"),
        col("next_brand").as("to_brand"))
      .agg(count(lit(1)).as("n"))
    val out = edges.groupBy("from_brand").agg(sum("n").as("out_n"))
    val p6 = edges.join(out, "from_brand")
      .select(col("from_brand"), col("to_brand"),
        expr("(n * 1000000L) div out_n").as("p6"))
      .localCheckpoint() // every round reuses the static edge table
    val nodes = p6.select(col("from_brand").as("brand"))
      .unionByName(p6.select(col("to_brand").as("brand")))
      .distinct().localCheckpoint()
    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      val mx = raw.agg(max("raw").as("mx"))
      nodes.join(broadcast(raw), Seq("brand"), "left")
        .crossJoin(broadcast(mx))
        .select(col("brand"),
          expr(s"(coalesce(raw, 0L) * 1000000L) div mx").as(scoreCol))
    }
    var hub = nodes.select(col("brand"), lit(1000000L).as("h"))
    var auth = nodes.select(col("brand"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      auth = normalized(
        p6.join(broadcast(hub.withColumnRenamed("brand", "from_brand")),
            "from_brand")
          .groupBy(col("to_brand").as("brand"))
          .agg(sum(expr("(p6 * h) div 1000000")).as("raw")), "a")
      hub = normalized(
        p6.join(broadcast(auth.withColumnRenamed("brand", "to_brand")),
            "to_brand")
          .groupBy(col("from_brand").as("brand"))
          .agg(sum(expr("(p6 * a) div 1000000")).as("raw")), "h")
    }
    hub.join(auth, "brand")
      .select(col("brand"), col("h").as("hub_i"), col("a").as("auth_i"),
        (col("h").cast("double") / lit(1000000.0)).as("hub"),
        (col("a").cast("double") / lit(1000000.0)).as("authority"))
      .orderBy(desc("auth_i"), col("brand"))
  }

  /** q309 — time-decayed co-visitation: the q68 basket pairs weighted
    * by recency — each order contributes 10⁶ >> (age_in_28d_windows)
    * to its brand pairs, so a pair's score halves every four weeks of
    * staleness and the ranking tracks CURRENT affinity instead of
    * all-time counts (the decay every production co-visitation /
    * "customers also bought" surface applies). The decay is an
    * integer SHIFT on the micro weight — dyadic, exact, no float in
    * the hot path; the anchor is the corpus max order date (1-row
    * aggregate).
    *
    * Scale: q68's shape (one order-grain shuffle, in-row bounded pair
    * fan-out) + one broadcast scalar; top-k via
    * TakeOrderedAndProject. */
  def decayedCovisitation(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("p_brand"))),
        1, MaxBasketWidth).as("brands"))
    val od = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("day"))
    val anchor = od.agg(max("day").as("maxd"))
    val rankO = Seq(desc("w6sum"), col("brand_a"), col("brand_b"))
    baskets
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(anchor))
      .withColumn("w6", expr("shiftright(1000000L, cast(" +
        "least(cast(datediff(maxd, day) as bigint) div 28, 20L)" +
        " as int))"))
      .select(explode(col("brands")).as("brand_a"), col("brands"),
        col("w6"))
      .select(col("brand_a"), explode(col("brands")).as("brand_b"),
        col("w6"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_orders"), sum("w6").as("w6sum"))
      .orderBy(rankO: _*)
      .limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(rankO: _*)).cast("long"))
      .select(col("rank"), col("brand_a"), col("brand_b"),
        col("n_orders"), col("w6sum"),
        (col("w6sum").cast("double") / lit(1000000.0)).as("score"))
      .orderBy("rank")
  }

  /** q296 — Holt double-exponential smoothing (level + TREND), the
    * forecasting upgrade over q250's flat EWMA: a trending series
    * systematically lags a level-only forecast; Holt tracks the slope
    * and extrapolates it one step ahead.
    *
    * EXACT dyadic arithmetic: with α = β = ½ the recurrences
    *   l_t = (y_t + l_{t−1} + b_{t−1}) / 2
    *   b_t = (y_t − l_{t−1} + 3·b_{t−1}) / 4   (substituted form)
    * stay in BIGINTs when tracked at scale 4^t:
    *   L_t = 2·4^{t−1}·y_t + 2·L_{t−1} + 2·Q_{t−1}
    *   Q_t =    4^{t−1}·y_t −   L_{t−1} + 3·Q_{t−1}
    * — no division until the single IEEE cast at the edge (÷4⁷·100 for
    * dollars), so both engines produce identical integers and the one
    * final double bit-matches. Initialized over an 8-day lag window
    * (l₀ = y₀, b₀ = 0), 7 unrolled steps per row.
    *
    * Scale: one map-side-combined shuffle to (type × day) grain, then
    * a lag chain over that bounded frame — q250's exact shape with a
    * second state variable. */
  def holtForecast(spark: SparkSession, dir: String): DataFrame =
    holtFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(cents2(col("value"))).as("cents")))

  /** The Holt lag-chain core over a (event_type, day, cents) frame —
    * shared by the batch q296 and the q305 streaming monitor (which
    * maintains the day-grain frame as streaming state and reads the
    * forecast off it, q251's deployment shape). */
  def holtFrom(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    var f = daily
      .withColumn("y7", col("cents"))
    for (i <- 0 to 6)
      f = f.withColumn(s"y$i", lag(col("cents"), 7 - i).over(w))
    f = f.withColumn("l0", col("y0")).withColumn("q0", lit(0L))
    for (t <- 1 to 7) {
      val s = 1L << (2 * (t - 1)) // 4^(t−1)
      f = f
        .withColumn(s"l$t", lit(2L * s) * col(s"y$t")
          + lit(2L) * col(s"l${t - 1}") + lit(2L) * col(s"q${t - 1}"))
        .withColumn(s"q$t", lit(s) * col(s"y$t")
          - col(s"l${t - 1}") + lit(3L) * col(s"q${t - 1}"))
    }
    f.filter(col("y0").isNotNull)
      .select(col("event_type"), col("day"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (col("l7").cast("double") / lit(1638400.0)).as("level"),
        (col("q7").cast("double") / lit(1638400.0)).as("trend"),
        ((col("l7") + col("q7")).cast("double") / lit(1638400.0))
          .as("forecast"))
      .orderBy("event_type", "day")
  }

  /** q297 — MAD-based robust outlier audit per brand: median absolute
    * deviation is the robust dispersion gauge (50% breakdown point —
    * one bad price can move a stddev arbitrarily, never the MAD), and
    * `|x − median| > 3·MAD` is the classic contamination flag for
    * price-book audits.
    *
    * Exactness: prices are cents; an exact median is ?.0 or ?.5, so
    * DOUBLED medians are integers — deviations live in half-cents
    * (dev2 = |2·price − 2·median|), the MAD in quarter-cents (mad4 =
    * 2·median(dev2)), and the 3×-rule is the pure-integer predicate
    * 2·dev2 > 3·mad4 (which also degrades correctly to dev2 > 0 when
    * MAD = 0). No IEEE op until the display casts.
    *
    * Scale: two exact per-group medians (sort-based aggregation at
    * brand grain) + broadcast joins of the 25-row brand stats — the
    * approximate path at extreme scale is q119's GK sketch. */
  def brandPriceMad(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_brand").as("brand"),
        cents2(col("p_retailprice")).as("cents"))
    val med = p.groupBy("brand")
      .agg((expr("median(cents)") * lit(2.0)).cast("long").as("m2"))
    val dev = p.join(broadcast(med), "brand")
      .withColumn("dev2", abs(col("cents") * lit(2L) - col("m2")))
    val mad = dev.groupBy("brand")
      .agg((expr("median(dev2)") * lit(2.0)).cast("long").as("mad4"))
    dev.join(broadcast(mad), "brand")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_parts"),
        max("m2").as("m2"), max("mad4").as("mad4"),
        sum(when(col("dev2") * lit(2L) > col("mad4") * lit(3L), 1L)
          .otherwise(0L)).as("n_outliers"),
        max("dev2").as("maxdev2"))
      .select(col("brand"), col("n_parts"),
        (col("m2").cast("double") / lit(200.0)).as("median_price"),
        (col("mad4").cast("double") / lit(400.0)).as("mad"),
        col("n_outliers"),
        (col("maxdev2").cast("double") / lit(200.0)).as("max_dev"))
      .orderBy("brand")
  }

  /** q312 — CUSUM mean-shift changepoints per brand (Page 1954): the
    * sequential detector behind "did this brand's daily revenue level
    * SHIFT, and when" — the question q250's EWMA forecast (one-step
    * surprise) and q227's seasonal decomposition don't answer. The
    * textbook recursion S⁺_t = max(0, S⁺_{t−1} + x_t − k) is not a
    * window function, but its closed form IS: with P_t = Σ_{i≤t}
    * (x_i − k),   S⁺_t = P_t − min_{j≤t} P_j  and  S⁻_t = max_{j≤t}
    * P_j − P_t — a grouped cumulative sum plus cumulative extrema,
    * three frames over the same (brand × day) window. Allowance
    * k = the brand's mean daily cents (integer div) and threshold
    * h = 2k — both stated conventions, both exact integers, so every
    * CUSUM statistic is an exact BIGINT in cents and the alarm
    * predicate is integer comparison (no float anywhere before the
    * output formatting).
    *
    * Scale: one fact shuffle to (brand, day) grain (map-side
    * combined); the windows run on that ≤ |brands|·|days| frame —
    * day-grain partitions bounded by the corpus date span, never by
    * fact rows. Emits only alarm days with the breach direction. */
  def cusumChangepoints(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        to_date(col("l_shipdate")).as("day"),
        cents2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("cents"))
      .groupBy("brand", "day")
      .agg(sum("cents").as("x"))
    cusumFrom(daily, "brand")
  }

  /** The q312/q320 CUSUM core: `d` must carry exact integer `x` cents
    * at (keyCol, day) grain; emits the (key, direction) alarm mart.
    * Shared by the batch changepoint scan and the streaming monitor —
    * the drained maintained state must read off the identical
    * statistic. */
  private[graft] def cusumFrom(d: DataFrame, keyCol: String): DataFrame = {
    val ordered = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withK = d
      .withColumn("k_allow",
        expr(s"sum(x) over (partition by $keyCol)" +
          s" div count(1) over (partition by $keyCol)"))
      .withColumn("p", sum(col("x") - col("k_allow")).over(ordered))
    // the recursion's P_0 = 0 belongs in the extrema: an excursion
    // that never dips below its start must still measure from 0
    val alarms = withK
      .withColumn("s_plus", col("p") - least(lit(0L), min("p").over(ordered)))
      .withColumn("s_minus",
        greatest(lit(0L), max("p").over(ordered)) - col("p"))
    val stats = alarms
      .select(col(keyCol), col("day"), col("k_allow"),
        col("s_plus").as("stat"), lit("up").as("direction"))
      .unionAll(alarms.select(col(keyCol), col("day"), col("k_allow"),
        col("s_minus").as("stat"), lit("down").as("direction")))
    // the mart always has a (key, direction) row — the peak excursion
    // exists even when nothing breaches (a quiet series is a result,
    // not an empty frame); alarms are the count over the threshold
    val byKey = Window.partitionBy(keyCol, "direction")
    stats
      .withColumn("rn", row_number().over(
        byKey.orderBy(desc("stat"), asc("day"))))
      .withColumn("n_alarm_days",
        sum(when(col("stat") > col("k_allow") * 2, 1L).otherwise(0L))
          .over(byKey))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("direction"), col("n_alarm_days"),
        col("day").as("peak_day"),
        (col("stat").cast("double") / lit(100.0)).as("peak_stat"))
      .orderBy(keyCol, "direction")
  }

  /** q324 — split-CONFORMAL prediction intervals on the q250 EWMA
    * forecaster: the distribution-free uncertainty band modern
    * forecasting stacks publish instead of a bare point forecast
    * (Vovk et al.; finite-sample coverage ≥ 1−α with NO distributional
    * assumption). Calibration days (before the stated split) supply
    * absolute forecast residuals; q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    * residual (α = 0.2, the rank exact integer arithmetic:
    * k = (4·n_cal + 8) div 5); scoring days get [fc − q̂, fc + q̂] and
    * the mart reports the EMPIRICAL coverage those bands achieved —
    * the number that validates the guarantee.
    *
    * Exactness: the forecast is the dyadic-weight EWMA lag chain with
    * an INTEGER-division point estimate (num div den, cents), so
    * residuals, ranks, q̂, and the coverage predicate are all exact
    * integers; the only floats are output formatting.
    *
    * Scale: one fact shuffle to (channel × day) grain; lag chains,
    * residual ranks, and coverage run on that calendar-grain frame
    * (the q250/q262 reviewed window class). */
  def conformalForecast(spark: SparkSession, dir: String): DataFrame =
    conformalFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(cents2(col("value"))).as("cents")))

  /** The q324/q325 conformal core: `d` carries integer `cents` at
    * (event_type, day) grain — shared by the batch readout and the
    * streaming monitor (the drained maintained state must read off the
    * identical bands). */
  private[graft] def conformalFrom(d: DataFrame): DataFrame = {
    val splitDay = "2024-01-22"
    val window = 8
    val w = Window.partitionBy("event_type").orderBy("day")
    val terms = (1 to window).map { k =>
      val wt = 1L << (window - k)
      (coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(wt),
        when(lag(col("cents"), k).over(w).isNotNull, lit(wt))
          .otherwise(lit(0L)))
    }
    val fc = d
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .filter(col("den") > 0)
      .withColumn("fc", expr("num div den"))
      .withColumn("resid", abs(col("cents") - col("fc")))
      .withColumn("is_cal", col("day") < lit(splitDay).cast("date"))
      // feeds both the calibration ranks and the scoring side of the
      // self-join; the checkpoint also keeps q325's memory-table
      // lineage from tripping self-join reference resolution
      .localCheckpoint()
    val cal = fc.filter(col("is_cal"))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(asc("resid"), asc("day"))))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("k_rank", expr("least((4 * n_cal + 8) div 5, n_cal)"))
      .filter(col("rn") === col("k_rank"))
      .select(col("event_type"), col("n_cal"),
        col("resid").as("qhat_c"))
    fc.filter(!col("is_cal"))
      .join(broadcast(cal), Seq("event_type"))
      .groupBy("event_type")
      .agg(max("n_cal").as("n_cal"), count(lit(1)).as("n_score"),
        max("qhat_c").as("qhat_c"),
        sum(when(col("resid") <= col("qhat_c"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("event_type"), col("n_cal"), col("n_score"),
        (col("qhat_c").cast("double") / lit(100.0)).as("qhat"),
        val6(col("covered").cast("double") / col("n_score").cast("double"))
          .as("coverage"))
      .orderBy("event_type")
  }

  /** q319 — difference-in-differences promo-lift readout: the causal
    * 2×2 every experimentation-literate commerce team publishes when
    * treatment wasn't randomized per-unit — (treat − control) change
    * across a policy boundary, differencing out the common trend.
    * Units are (brand, day) daily-revenue observations; assignment is
    * the deterministic hash split a real platform uses
    * (portable32(brand) mod 2 — reproducible, oracle-mirrorable, the
    * q252 discipline) and the pre/post boundary is a stated calendar
    * date. Per cell the exact BIGINT power sums (n, Σx, Σx²) feed
    * fixed-shape IEEE means/variances (the q102/q252 class); the DiD
    * estimate, its pooled SE (Σ s²ᵢ/nᵢ under cell independence), and
    * the t statistic are one scalar tree each, val6 at the edge.
    *
    * Scale: one fact shuffle to (brand, day) grain, then a 4-row cell
    * aggregate and a 1-row final — nothing after the first reduction
    * touches data grain. */
  def didPromoLift(spark: SparkSession, dir: String): DataFrame = {
    val boundary = "1995-06-01"
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        to_date(col("l_shipdate")).as("day"),
        cents2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("cents"))
      .groupBy("brand", "day")
      .agg(sum("cents").as("x"))
      .select(
        (portable32(col("brand")) % 2 === 1).as("treat"),
        (col("day") >= lit(boundary).cast("date")).as("post"),
        col("x"))
    // Σx² in DECIMAL(38,0): daily-cents squares overflow BIGINT at
    // corpus scale; the decimal sum is exact on both engines and only
    // its one CAST-to-DOUBLE enters the variance tree
    val cells = daily.groupBy("treat", "post")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x").cast("decimal(19,0)")
          * col("x").cast("decimal(19,0)")).as("ss"))
    def cell(t: Boolean, p: Boolean, c: String) =
      max(when(col("treat") === t && col("post") === p, col(c)))
    val one = cells.agg(
      cell(true, false, "n").as("n_t_pre"), cell(true, false, "s").as("s_t_pre"),
      cell(true, false, "ss").as("ss_t_pre"),
      cell(true, true, "n").as("n_t_post"), cell(true, true, "s").as("s_t_post"),
      cell(true, true, "ss").as("ss_t_post"),
      cell(false, false, "n").as("n_c_pre"), cell(false, false, "s").as("s_c_pre"),
      cell(false, false, "ss").as("ss_c_pre"),
      cell(false, true, "n").as("n_c_post"), cell(false, true, "s").as("s_c_post"),
      cell(false, true, "ss").as("ss_c_post"))
    def m(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def v(ss: String, s: String, n: String) = {
      val num = col(ss).cast("double") -
        col(s).cast("double") * col(s).cast("double") /
          col(n).cast("double")
      num / (col(n).cast("double") - lit(1.0))
    }
    val did = (m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre")) -
      (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre"))
    val se = sqrt(
      v("ss_t_post", "s_t_post", "n_t_post") / col("n_t_post").cast("double")
        + v("ss_t_pre", "s_t_pre", "n_t_pre") / col("n_t_pre").cast("double")
        + v("ss_c_post", "s_c_post", "n_c_post") / col("n_c_post").cast("double")
        + v("ss_c_pre", "s_c_pre", "n_c_pre") / col("n_c_pre").cast("double"))
    one.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      val6(m("s_t_pre", "n_t_pre") / lit(100.0)).as("mean_treat_pre"),
      val6(m("s_t_post", "n_t_post") / lit(100.0)).as("mean_treat_post"),
      val6(m("s_c_pre", "n_c_pre") / lit(100.0)).as("mean_ctrl_pre"),
      val6(m("s_c_post", "n_c_post") / lit(100.0)).as("mean_ctrl_post"),
      val6(did / lit(100.0)).as("did_estimate"),
      val6(se / lit(100.0)).as("se"),
      val6(did / se).as("t_stat"),
      (abs(did / se) > lit(1.96)).as("significant"))
  }

  /** q313 — Kaplan–Meier repeat-purchase survival: the product-limit
    * estimator S(t) = Π_{u≤t} (1 − d_u/n_u) over the SAME
    * first→second-purchase cohort as q262's Nelson–Aalen hazard — the
    * pair every survival readout publishes together (KM is the curve,
    * NA its log-scale twin; they cross-check each other since
    * S ≈ exp(−H)). Risk sets come from the identical day-grain
    * endpoint histogram (descending running sum).
    *
    * Determinism: each factor's log is floor-scaled to integer nanos
    * BEFORE the running sum — ln((n−d)/n) is one correctly-rounded
    * IEEE op per event day, the accumulation is exact integer
    * addition, and exp() runs once per emitted row on the summed
    * integer (the q262/q308 nano-floor discipline — no float
    * accumulation order for engines to disagree on). A day where
    * d = n (everyone at risk converts) sends the survival to exact
    * 0.0 from there on, guarded by a cumulative flag instead of
    * ln(0). */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val users = p.withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 2)
      .groupBy("user_id")
      .agg(min(when(col("rn") === 1, col("us"))).as("t1"),
        min(when(col("rn") === 2, col("us"))).as("t2"))
    val obsEnd = p.agg(max("us").as("end_us"))
    val hist = users.crossJoin(broadcast(obsEnd))
      .select(
        expr(s"CASE WHEN t2 IS NOT NULL THEN (t2 - t1) DIV $dayUs END")
          .as("event_day"),
        expr(s"CASE WHEN t2 IS NULL THEN (end_us - t1) DIV $dayUs END")
          .as("censor_day"))
      .groupBy(coalesce(col("event_day"), col("censor_day")).as("day"))
      .agg(count(lit(1)).as("ended"),
        sum(when(col("event_day").isNotNull, 1L).otherwise(0L))
          .as("d"))
    val upTo = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("n_risk", sum("ended").over(Window.orderBy(desc("day"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("d") > 0)
      .withColumn("l9",
        when(col("d") < col("n_risk"),
          floor(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double")) * lit(1.0e9) + lit(0.5))
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("cum_l9", sum("l9").over(upTo))
      .withColumn("hit_zero",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(upTo))
      .select(col("day"), col("n_risk"), col("d").as("n_converted"),
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(val6(exp(col("cum_l9").cast("double") / lit(1.0e9))))
          .as("km_survival"))
      .orderBy("day")
  }
}
