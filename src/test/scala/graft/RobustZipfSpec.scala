package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, TextOps}
import graft.sources.Tables

/** q246/q247 semantics pinned beyond the hash gate: the rank-based
  * trimmed/winsorized means against an in-driver brute force on the
  * collected per-segment values, and the Zipf profile's rank/monotone
  * invariants against a plain groupBy recomputation.
  */
class RobustZipfSpec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("q246: trimmed/winsorized means equal the sorted-array brute force") {
    val out = Analytics.robustStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val cents = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("c"),
        $"o_orderkey")
      .as[(String, Long, Long)].collect()
      // the operator's tie-break: (cents, o_orderkey)
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(r => (r._2, r._3)).map(_._2)
      }
    assert(out.keySet == cents.keySet)
    for ((segment, v) <- cents) {
      val n = v.length
      val k = math.floor(n * 0.1).toLong.toInt
      val interior = v.slice(k, n - k)
      val trimmed = interior.sum.toDouble / 100.0 / (n - 2 * k)
      val winsor = (interior.sum + k.toLong * (v(k) + v(n - k - 1)))
        .toDouble / 100.0 / n
      val r = out(segment)
      assert(r.getLong(1) == n, s"$segment n")
      assert(r.getLong(2) == k, s"$segment k")
      assert(math.abs(r.getDouble(3) - trimmed) < 1e-9, s"$segment trimmed")
      assert(math.abs(r.getDouble(4) - winsor) < 1e-9, s"$segment winsor")
      assert(r.getDouble(5) == v(k).toDouble / 100.0, s"$segment lo")
      assert(r.getDouble(6) == v(n - k - 1).toDouble / 100.0, s"$segment hi")
      // robustness direction: both estimators live inside the clamp hull
      assert(r.getDouble(3) >= r.getDouble(5) && r.getDouble(3) <= r.getDouble(6))
      assert(r.getDouble(4) >= r.getDouble(5) && r.getDouble(4) <= r.getDouble(6))
    }
  }

  test("q247: doubling ranks, monotone frequencies, exact head") {
    val p = TextOps.zipfProfile(spark, dir).cache()
    val rows = p.orderBy("rk").collect()
    assert(rows.nonEmpty)
    // ranks are exactly the powers of two that fit the vocabulary
    val vocab = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .agg(countDistinct($"t")).as[Long].head()
    val expected = Iterator.iterate(1L)(_ * 2)
      .takeWhile(r => r <= 8192L && r <= vocab).toSeq
    assert(rows.map(_.getLong(0)).toSeq == expected)
    // freq non-increasing in rank → every doubling ratio >= 1
    val freqs = rows.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    rows.dropRight(1).foreach { r =>
      assert(!r.isNullAt(4) && r.getDouble(4) >= 1.0, s"ratio at rk=${r.getLong(0)}")
    }
    assert(rows.last.isNullAt(4)) // no rank past the last doubling
    // rank 1 is the true global argmax (count desc, token asc)
    val top = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .orderBy($"f".desc, $"t".asc).limit(1)
      .as[(String, Long)].head()
    assert((rows.head.getString(1), rows.head.getLong(2)) == top)
    p.unpersist()
  }
}
