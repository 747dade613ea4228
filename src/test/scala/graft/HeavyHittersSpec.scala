package graft

import org.apache.spark.sql.functions._

import graft.operators.Events

/** q94: two-phase Misra-Gries heavy hitters must be EXACT — identical
  * to the plain groupBy + share filter, no false positives/negatives —
  * and survive a small k (candidate superset guarantee, k ≥ 1/φ).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def expected(): Map[Long, Long] = {
    val counts = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id").count().as[(Long, Long)].collect()
    val total = counts.map(_._2).sum
    val nd = counts.length
    counts.filter { case (_, c) => c.toDouble * nd > 1.25 * total }.toMap
  }

  test("exact vs plain group-filter, and exact under a minimal k") {
    val exp = expected()
    assert(exp.nonEmpty, "testdata has no heavy users at this threshold")
    val got = Events.heavyHitters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
    // k just above 1/φ (= nd/1.25) must still be exact — the Misra-
    // Gries superset guarantee, not luck from a huge counter budget
    val nd = graft.sources.Tables.events(spark, dir)
      .select(countDistinct($"user_id")).as[Long].head()
    val minimalK = (nd / 1.25).toInt + 1
    val gotSmall = Events.heavyHitters(spark, dir, k = minimalK).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotSmall == exp, s"not exact at k=$minimalK")
  }

  test("Misra-Gries property: candidates ⊇ every key above n/k, any stream") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { trial =>
      val k = 2 + rnd.nextInt(30)
      val nKeys = 1 + rnd.nextInt(200)
      // zipf-ish skew: key i drawn with weight ~ 1/(i+1)
      val n = 500 + rnd.nextInt(5000)
      val stream = Array.fill(n) {
        val u = rnd.nextDouble()
        (nKeys * math.pow(u, 3)).toLong // cube biases toward small ids
      }
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
      val heavy = exact.filter(_._2 * k > n).keySet
      val candidates = Events.misraGries(stream.iterator, k).toSet
      assert(heavy.subsetOf(candidates),
        s"trial $trial (k=$k n=$n): missing ${heavy.diff(candidates)}")
      assert(candidates.size <= k, s"trial $trial: memory bound broken")
    }
  }
}
