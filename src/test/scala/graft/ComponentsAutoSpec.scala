package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Round-10 optimization pins: the compositions (curation verdicts,
  * IVF dedup verdicts, leakage-safe split, release manifest, …) now
  * resolve their closures through [[Graphs.componentsAuto]] — this
  * spec is the equality proof that the escape hatch IS components'
  * min-label semantics in BOTH regimes, on a graph that exercises
  * chains, cycles, stars and singleton-adjacent edges.
  */
class ComponentsAutoSpec extends SparkSpec {

  // chain 1-2-3-4, 3-cycle 20-21-22, star at 7, plus a far pair:
  // transitive hops, direction-independence, and min-root ties
  private val edges = Seq(
    (2L, 1L), (2L, 3L), (3L, 4L),
    (20L, 21L), (21L, 22L), (22L, 20L),
    (7L, 5L), (7L, 6L), (8L, 7L),
    (1000000L, 999999L))

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("componentsAuto (driver union-find regime) == components") {
    import spark.implicits._
    val e = edges.toDF("a", "b")
    val dist = toMap(Graphs.components(e, "a", "b"))
    val auto = toMap(Graphs.componentsAuto(e, "a", "b")) // 10 edges << limit
    assert(auto == dist)
  }

  test("componentsAuto above the edge bound falls back to the " +
      "distributed loop and still agrees") {
    import spark.implicits._
    val e = edges.toDF("a", "b")
    val dist = toMap(Graphs.components(e, "a", "b"))
    val auto = toMap(Graphs.componentsAuto(e, "a", "b",
      driverEdgeLimit = 3L)) // forces the distributed path
    assert(auto == dist)
  }

  test("kCore early fixpoint exit returns the same core as the full " +
      "unroll (rounds so large every cascade has converged)") {
    val dir = sf("sf0.001")
    val full = Graphs.kCore(spark, dir, rounds = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dflt = Graphs.kCore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dflt == full)
  }

  test("gated closure consumers agree across the swap: dedupClustersAuto " +
      "== dedupClusters row-for-row") {
    val a = Graphs.dedupClusters(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted
    val b = Graphs.dedupClustersAuto(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
