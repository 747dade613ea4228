package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvDistinct
import graft.util.Portable

/** KMV sketch invariants: exact below k, bounded error above k,
  * partition-count independence (the merge path), SQL registration.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, parts: Int) =
    spark.range(0, n, 1, parts)
      .select(Portable.portable32($"id".cast("string")).as("hv"))

  test("below k the sketch is exact") {
    val est = hashed(40, 4).agg(KmvDistinct.kmvDistinct($"hv", 64))
      .as[Long].head()
    assert(est == 40L)
  }

  test("above k the estimate lands within the KMV error envelope") {
    val n = 5000
    val est = hashed(n, 8).agg(KmvDistinct.kmvDistinct($"hv", 64))
      .as[Long].head()
    // k=64 → σ ≈ n/√(k-2) ≈ 12.7%; 4σ envelope keeps flakiness at ~0
    assert(math.abs(est - n) < n * 0.51, s"estimate $est vs $n")
  }

  test("estimate is independent of partitioning (merge correctness)") {
    val ests = Seq(1, 3, 16).map { p =>
      hashed(2000, p).agg(KmvDistinct.kmvDistinct($"hv", 64)).as[Long].head()
    }
    assert(ests.distinct.size == 1, s"partition-dependent: $ests")
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    val once = hashed(500, 4)
    val thrice = once.union(once).union(once)
    val a = once.agg(KmvDistinct.kmvDistinct($"hv", 64)).as[Long].head()
    val b = thrice.agg(KmvDistinct.kmvDistinct($"hv", 64)).as[Long].head()
    assert(a == b)
  }

  test("SQL registration: kmv_distinct usable from spark.sql") {
    KmvDistinct.register(spark)
    hashed(300, 4).createOrReplaceTempView("kmv_in")
    val est = spark.sql("SELECT kmv_distinct(hv) FROM kmv_in").as[Long].head()
    val direct = hashed(300, 4).agg(KmvDistinct.kmvDistinct($"hv", 64))
      .as[Long].head()
    assert(est == direct)
  }
}
