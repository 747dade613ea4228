package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy-preserving release operators — the sibling stage of the
  * GDPR tombstone plumbing (q231–q236 retract what must be FORGOTTEN;
  * these transform what may be SHARED). Both are scan-local or
  * one-aggregate shapes: nothing here costs more than a groupBy at
  * any scale. */
object Privacy {

  /** q238: PII pseudonymization mart — the redacted customer
    * dimension a pipeline ships to analysts / model training when the
    * raw table is restricted:
    *
    *   - direct identifier: `c_name` leaves as a keyed PSEUDONYM
    *     (md5 — deterministic so joins still work across marts) plus
    *     a digit-masked display form;
    *   - sensitive numeric: `c_acctbal` is GENERALIZED to a $1000
    *     band (k-anonymity's value generalization for a continuous
    *     attribute) via the Portable cents discipline — never float
    *     floor on a raw double quotient;
    *   - quasi-identifiers (nation, segment) pass through — q239
    *     audits their re-identification risk.
    *
    * Scale: map-only over the dimension; codegen'd hash + regexp. */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("name_hash"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("name_masked"),
        floor(cents.cast("double") / lit(100000.0)).cast("long")
          .as("acct_band"),
        col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** q239: k-anonymity audit with one-step generalization — the
    * release gate on q238's quasi-identifiers. Cells of the
    * (nation, segment) contingency table with fewer than `k` members
    * are re-identification risks; the standard lattice climb
    * generalizes the finer attribute away (segment → '*') and
    * re-checks at nation grain; cells still under k are SUPPRESSED
    * (would be withheld from the release):
    *
    *   - level 0 `released`:     (nation, segment) with n ≥ k;
    *   - level 1 `generalized`:  violating cells merged per nation,
    *     merged size ≥ k;
    *   - level 2 `suppressed`:   merged size still < k.
    *
    * Scale: two aggregates over the dimension — the second runs on
    * the violating cells only (cell grain, ≤ |nations|×|segments|
    * rows — metadata-sized whatever the table size). */
  def kAnonymity(spark: SparkSession, dir: String, k: Long = 5): DataFrame = {
    val cells = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val released = cells.filter(col("n") >= k)
      .select(col("c_nationkey"), col("c_mktsegment").as("segment"),
        col("n"), lit(0).as("gen_level"), lit("released").as("status"))
    val merged = cells.filter(col("n") < k)
      .groupBy("c_nationkey")
      .agg(sum("n").as("n"))
      .select(col("c_nationkey"), lit("*").as("segment"), col("n"),
        when(col("n") >= k, lit(1)).otherwise(lit(2)).as("gen_level"),
        when(col("n") >= k, lit("generalized"))
          .otherwise(lit("suppressed")).as("status"))
    released.unionByName(merged)
      .orderBy("c_nationkey", "segment")
  }

  /** q241: the k-ANONYMIZED RELEASE — q238's redacted rows shipped
    * under q239's cell verdicts, which is the table that actually
    * leaves the building: rows in `released` cells keep their
    * segment, rows in `generalized` cells ship with segment '*', rows
    * in `suppressed` cells do not ship at all. The released table
    * satisfies k-anonymity on (nation, segment) BY CONSTRUCTION —
    * q239's spec proves the verdicts, this applies them.
    *
    * Scale: the verdict table is cell-grain (metadata-sized) →
    * broadcast joins against the row scan; nothing shuffles the
    * dimension. */
  /** q248: l-diversity audit — the attack k-anonymity does NOT stop:
    * a cell can hold k≥5 members who all share the same sensitive
    * value, so membership alone discloses it (Machanavajjhala et al.
    * 2007's homogeneity attack). For each quasi-identifier cell of the
    * q239 release ((nation, segment)) against q238's sensitive
    * attribute (the $1000 account band), report:
    *
    *   - `l_distinct`: distinct sensitive values in the cell —
    *     distinct l-diversity's l;
    *   - `max_f` / `top_share`: the modal band's frequency — the
    *     adversary's best-guess confidence (probabilistic flavor);
    *   - `status`: `diverse` iff l_distinct ≥ l, else `exposed`.
    *
    * Together q239 (cell size) + q248 (cell diversity) are the two
    * release gates a real anonymization pipeline runs before shipping.
    *
    * Scale: one band-grain aggregate over the dimension, then a
    * cell-grain rollup (≤ |nations|×|segments| rows — metadata-sized
    * whatever the table size). `top_share` is an exact-integer
    * division (Portable discipline). */
  def lDiversity(spark: SparkSession, dir: String, l: Long = 3): DataFrame = {
    val cents = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
    val bandFreq = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"),
        floor(cents.cast("double") / lit(100000.0)).cast("long")
          .as("band"))
      .groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).as("f"))
    bandFreq.groupBy("c_nationkey", "c_mktsegment")
      .agg(sum("f").as("n"), count(lit(1)).as("l_distinct"),
        max("f").as("max_f"))
      .select(col("c_nationkey"), col("c_mktsegment").as("segment"),
        col("n"), col("l_distinct"), col("max_f"),
        (col("max_f").cast("double") / col("n").cast("double"))
          .as("top_share"),
        when(col("l_distinct") >= l, lit("diverse"))
          .otherwise(lit("exposed")).as("status"))
      .orderBy("c_nationkey", "segment")
  }

  def anonymizedRelease(spark: SparkSession, dir: String,
      k: Long = 5): DataFrame = {
    val cells = kAnonymity(spark, dir, k)
    val l0 = cells.filter(col("gen_level") === 0)
      .select(col("c_nationkey"), col("segment").as("c_mktsegment"),
        lit(true).as("rel0"))
    val l1 = cells.filter(col("gen_level") >= 1)
      .select(col("c_nationkey"),
        (col("status") === "generalized").as("gen1"))
    piiRedaction(spark, dir)
      .join(broadcast(l0), Seq("c_nationkey", "c_mktsegment"), "left")
      .join(broadcast(l1), Seq("c_nationkey"), "left")
      .filter(col("rel0").isNotNull || col("gen1") === true)
      .select(col("c_custkey"), col("name_hash"), col("name_masked"),
        col("acct_band"), col("c_nationkey"),
        when(col("rel0").isNotNull, col("c_mktsegment"))
          .otherwise(lit("*")).as("segment_out"))
      .orderBy("c_custkey")
  }

  /** q301 — t-closeness audit (Li et al.), the escalation past
    * k-anonymity (q239) and l-diversity (q248): a cell can be large
    * AND diverse yet still leak — if its sensitive-value DISTRIBUTION
    * sits far from the table's, membership alone shifts an attacker's
    * posterior. For the ORDERED sensitive attribute (the q248 $1000
    * acctbal bands) the distance is the Earth-Mover's Distance, which
    * for ordered categories is the mean |cumulative-share gap|:
    * EMD = Σ_i |P_cell(≤ band_i) − P_table(≤ band_i)| / (m − 1).
    *
    * Determinism: cumulative shares are micro-unit integer divisions
    * (cum·10⁶ div n), the gap sum is an order-independent integer
    * sum, and the final mean is one more integer div — so the audit
    * is exact on both engines, and every intermediate is bounded by
    * the band VOCABULARY (≤10⁶·m), never the data size.
    *
    * Scale: one aggregate to (cell × band) grain, a bounded
    * cells × bands densify (cumulative sums need the zero rows), and
    * windows over that vocabulary-grain frame. */
  def tCloseness(spark: SparkSession, dir: String,
      tMicro: Long = 200000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
    val bandFreq = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"),
        floor(cents.cast("double") / lit(100000.0)).cast("long")
          .as("band"))
      .groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).as("f"))
      .localCheckpoint() // cells × bands grain feeds three derivations
    // global band distribution + its cumulative micro-shares (the
    // band set is a handful of rows; the ordered cum runs there)
    val gw = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = bandFreq.groupBy("band").agg(sum("f").as("g"))
      .withColumn("cum_g", sum("g").over(gw))
      .crossJoin(broadcast(bandFreq.agg(sum("f").as("nn"),
        countDistinct("band").as("m"))))
      .select(col("band"), col("m"),
        expr("(cum_g * 1000000L) div nn").as("pg6"))
    val cells = bandFreq.select("c_nationkey", "c_mktsegment").distinct()
    val cw = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(global))
      .join(bandFreq, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .withColumn("cum_f", sum(coalesce(col("f"), lit(0L))).over(cw))
      .withColumn("n", sum(coalesce(col("f"), lit(0L))).over(
        Window.partitionBy("c_nationkey", "c_mktsegment")))
      .groupBy(col("c_nationkey"), col("c_mktsegment").as("segment"))
      .agg(max("n").as("n"), max("m").as("m"),
        sum(abs(expr("(cum_f * 1000000L) div n") - col("pg6")))
          .as("gap6"))
      .select(col("c_nationkey"), col("segment"), col("n"),
        expr("gap6 div (m - 1)").as("emd6"),
        (expr("gap6 div (m - 1)").cast("double") / lit(1000000.0))
          .as("emd"),
        (expr("gap6 div (m - 1)") <= tMicro).as("t_close"))
      .orderBy("c_nationkey", "segment")
  }

  /** q304 — differentially-private noisy release: the last rung of
    * the privacy ladder (pseudonymize q238 → k-anon q239 → l-diverse
    * q248 → t-close q301 → PERTURB): per-cell counts released with
    * two-sided-geometric (discrete Laplace) noise at ε = 1 and a
    * small-cell suppression flag — the mechanism census-style
    * releases actually ship.
    *
    * The noise is DETERMINISTIC here — inverse-CDF sampling driven by
    * the portable hash of the cell key instead of a PRNG — for the
    * same reason q48's sampler is: the gate must hash-match, and a
    * deployment swaps the hash for a seeded generator without
    * touching the dataflow. The inverse CDF truncates the geometric
    * at the hash grid's resolution (|noise| ≤ 13 at the 10⁻⁶ grid) —
    * documented, and immaterial to the mechanism's shape. Both
    * engines evaluate the identical IEEE expression tree (one ln, a
    * handful of mul/divs — the q182 determinism class) on identical
    * integers, so noise values are bit-equal.
    *
    * Scale: one map-side-combined aggregate to the cell grain; the
    * noise is a scalar expression per CELL, not per row. */
  def dpNoisyRelease(spark: SparkSession, dir: String,
      epsilon: Double = 1.0, suppressBelow: Long = 5L): DataFrame = {
    import graft.util.Portable.portable32
    val up = lit(2.0) * ((
      (portable32(concat(col("c_nationkey").cast("string"), lit("|"),
        col("segment"))) % lit(1000000L)).cast("double") + lit(0.5))
      / lit(1000000.0)) - lit(1.0)
    val noise = (signum(up).cast("long") *
      floor(log(lit(1.0) - abs(up)) / lit(-epsilon)).cast("long"))
      .as("noise")
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("segment"), col("n"), noise)
      .select(col("c_nationkey"), col("segment"), col("n"), col("noise"),
        (col("n") + col("noise")).as("noisy_count"),
        lit(epsilon).as("epsilon"),
        (col("n") + col("noise") < suppressBelow).as("suppressed"))
      .orderBy("c_nationkey", "segment")
  }
}
