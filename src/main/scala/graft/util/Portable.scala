package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Cross-engine-deterministic column helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB
  * oracle, so every float we emit must be a deterministic function of
  * exact values. Decimal casts are NOT portable: Spark's double→decimal
  * rounds the shortest decimal representation (HALF_UP on
  * `BigDecimal.decimal`), DuckDB rounds the binary value — e.g. the
  * product 11690.36505 (binary ≈ …504999…) lands on different sides.
  *
  * Portable form: scale to an integer with `floor(x*scale + 0.5)`.
  * Multiply/add/floor are exact IEEE-754 ops with identical results in
  * any engine; sums then run over integers (order-independent, exact)
  * and only the final value is divided back into a double — again a
  * deterministic single IEEE op. Sums stay below 2^53 up to ~1e6 rows ×
  * 1e9 scaled units; the 100 TB deployment would keep the integer/
  * decimal representation end-to-end and format only at the edge.
  */
object Portable {

  /** Money scaled to integer cents (2 decimals — the reference's money
    * columns, SURVEY.md §1.3; ecom_Gold_Layer.ipynb:154–159). */
  def cents2(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(LongType)

  /** Derived money (price × rate products) at 4 decimals. */
  def cents4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)).cast(LongType)

  /** Per-row money value rounded to 2dp, emitted as double. */
  def val2(c: Column): Column = cents2(c).cast(DoubleType) / lit(100.0)

  def val4(c: Column): Column = cents4(c).cast(DoubleType) / lit(10000.0)

  /** Portable 6-decimal rounding for ratios/similarities (round(x, n)
    * is NOT portable: Spark rounds the shortest decimal repr, DuckDB
    * the binary value). */
  def val6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast(LongType)
      .cast(DoubleType) / lit(1000000.0)

  /** Exact sum of a double money column, emitted as double. */
  def sumMoney2(c: Column): Column =
    sum(cents2(c)).cast(DoubleType) / lit(100.0)

  def sumMoney4(c: Column): Column =
    sum(cents4(c)).cast(DoubleType) / lit(10000.0)

  /** Exact average = exact integer sum / count (deterministic IEEE div). */
  def avgExact2(c: Column): Column =
    sum(cents2(c)).cast(DoubleType) / lit(100.0) / count(c)

  /** Portable 32-bit token hash: first 8 hex chars of md5, as a long.
    * Identical in DuckDB as `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`,
    * which lets MinHash/SimHash signatures be oracle-verified. For
    * internal (non-oracle) hot paths prefer [[fast64]]. */
  def portable32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Fast 64-bit hash for internal bucketing at scale (not oracle-portable). */
  def fast64(c: Column*): Column = xxhash64(c: _*)

  /** DuckDB-side macro mirrors of the helpers above, for oracle SQL. */
  object Sql {
    // NOTE: every helper parenthesizes ($x) before the scale multiply —
    // without it, a caller passing an additive expression ("a - b")
    // would have `* 100.0` bind to the last operand only (caught live
    // by q263's Wilson `center - half`; division chains only survived
    // because * and / share precedence).
    def sum2(x: String): String =
      s"CAST(SUM(CAST(FLOOR(($x) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
    def sum4(x: String): String =
      s"CAST(SUM(CAST(FLOOR(($x) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0"
    def val2(x: String): String =
      s"CAST(CAST(FLOOR(($x) * 100.0 + 0.5) AS BIGINT) AS DOUBLE) / 100.0"
    def val4(x: String): String =
      s"CAST(CAST(FLOOR(($x) * 10000.0 + 0.5) AS BIGINT) AS DOUBLE) / 10000.0"
    def val6(x: String): String =
      s"CAST(CAST(FLOOR(($x) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0"
    def avg2(x: String): String =
      s"CAST(SUM(CAST(FLOOR(($x) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT($x)"
    val hash32: String => String =
      x => s"CAST('0x' || substr(md5($x), 1, 8) AS BIGINT)"
  }
}
