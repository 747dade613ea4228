package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q254: declarative data-quality expectations — the contract gate a
  * pipeline runs before promoting a batch (the Deequ/Great-
  * Expectations shape, re-expressed as ONE Spark aggregate): each
  * expectation is a named predicate whose violation count is a
  * conditional sum, so the whole suite costs a single scan of the
  * fact table plus one anti-join for the referential check — never
  * one pass per rule. Extends q20's counters (which tally known dirt
  * in events) to the CONTRACT form: named rule → n_rows →
  * n_violations → pass, the table a release gate reads.
  *
  * The suite deliberately includes one expectation that FAILS on
  * TPC-H (`quantity_le_45` — quantities run 1..50) so the report
  * mechanism demonstrably reports, not just rubber-stamps. It also
  * SURFACED a real fixture property: `unique_line` fails because the
  * driver's synthetic lineitem reuses (l_orderkey, l_linenumber)
  * (~24% duplicate pairs at every SF) — exactly the kind of contract
  * drift the gate exists to catch before a batch promotes.
  *
  * Scale: the agg is map-side combinable; the uniqueness check rides
  * the same pass as a distinct-count; the FK anti-join is the only
  * shuffle (bloom-prunable at 100 TB — q81's pattern). Output is
  * rule-grain (7 rows) whatever the table size. */
object Expectations {

  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val base = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_orderkey").isNull || col("l_partkey").isNull
        || col("l_suppkey").isNull, 1L).otherwise(0L)).as("v_null"),
      sum(when(!(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0),
        1L).otherwise(0L)).as("v_qty"),
      sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("v_qty45"),
      sum(when(!(col("l_discount") >= 0.0 && col("l_discount") <= 0.10),
        1L).otherwise(0L)).as("v_disc"),
      sum(when(!(col("l_returnflag").isin("A", "N", "R")
        && col("l_linestatus").isin("O", "F")), 1L)
        .otherwise(0L)).as("v_flag"),
      sum(when(!(col("l_tax") >= 0.0 && col("l_tax") <= 0.08), 1L)
        .otherwise(0L)).as("v_tax"),
      sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L))
        .as("v_price"),
      count_distinct(col("l_orderkey"), col("l_linenumber"))
        .as("n_distinct"))
    val fk = li
      .join(Tables.orders(spark, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk"))
    def rule(name: String, v: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"), col("n").as("n_rows"),
        v.as("n_violations"))
    base.crossJoin(fk)
      .select(explode(array(
        rule("discount_range", col("v_disc")),
        rule("fk_orderkey", col("v_fk")),
        rule("not_null_keys", col("v_null")),
        rule("positive_price", col("v_price")),
        rule("quantity_le_45", col("v_qty45")),
        rule("quantity_range", col("v_qty")),
        rule("tax_range", col("v_tax")),
        rule("unique_line", col("n") - col("n_distinct")),
        rule("valid_flags", col("v_flag")))).as("r"))
      .select(col("r.check_name"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0).as("pass"))
      .orderBy("check_name")
  }
}
