package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.sources.Tables

/** q254 — the DQ contract report: internal consistency plus the two
  * expected verdict classes (the deliberately-tight rule fails, the
  * contract rules pass, and the fixture's duplicate line numbers are
  * surfaced rather than papered over). */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("report is rule-grain, internally consistent, and verdicts " +
      "land where the data says they must") {
    val r = Expectations.expectations(spark, dir).cache()
    val rows = r.as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 9)
    assert(rows.map(_._1).distinct.length == 9)
    val n = Tables.lineitem(spark, dir).count()
    rows.foreach { case (name, nr, v, pass) =>
      assert(nr == n, s"$name denominator $nr != $n")
      assert(v >= 0 && v <= n, s"$name violations out of range: $v")
      assert(pass == (v == 0), s"$name verdict inconsistent")
    }
    val byName = rows.map(x => x._1 -> x._3).toMap
    // the deliberately-tight rule must fail on TPC-H quantities
    assert(byName("quantity_le_45") > 0)
    // the fixture's duplicate (orderkey, linenumber) pairs must match
    // an independent distinct count
    val dupes = n - Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(byName("unique_line") == dupes)
    // genuine contract rules hold on this data
    Seq("discount_range", "fk_orderkey", "not_null_keys",
      "positive_price", "quantity_range", "tax_range", "valid_flags")
      .foreach(k => assert(byName(k) == 0, s"$k unexpectedly failed"))
    r.unpersist()
  }
}
