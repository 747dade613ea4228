package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Large-star/small-star CC must produce the identical component
  * partition as min-label propagation on adversarial topologies —
  * including the high-diameter chains it exists to accelerate.
  */
class GraphsStarSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("a", "b")
    val prop = labelsOf(Graphs.components(df, "a", "b"))
    val star = labelsOf(Graphs.componentsStar(df, "a", "b"))
    assert(star == prop, s"partitions differ:\nstar=$star\nprop=$prop")
  }

  test("chain of 40 (diameter = n, the propagation worst case)") {
    check((1L until 40L).map(i => (i, i + 1)))
  }

  test("ring + star + isolated pair + random clutter") {
    val ring = (0L until 20L).map(i => (100 + i, 100 + (i + 1) % 20))
    val star = (1L to 10L).map(i => (500L, 500 + i))
    val pair = Seq((900L, 901L))
    val rnd = new scala.util.Random(11)
    val clutter = (1 to 60).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    check(ring ++ star ++ pair ++ clutter)
  }

  test("random graphs across densities agree with propagation") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(100)
      val m = n / 2 + rnd.nextInt(2 * n)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) check(edges)
    }
  }

  test("component label is the true minimum reachable id") {
    val edges = Seq((5L, 9L), (9L, 3L), (12L, 14L))
    val star = labelsOf(Graphs.componentsStar(edges.toDF("a", "b"), "a", "b"))
    assert(star == Map(5L -> 3L, 9L -> 3L, 3L -> 3L, 12L -> 12L, 14L -> 12L))
  }
}
