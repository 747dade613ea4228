package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalCuration => IC}

/** Incremental re-curation (q157): the merged verdict table must equal
  * the full recompute on the current snapshot — including the
  * corpus-GLOBAL dedup stage, where removing/changing/adding one doc
  * can flip verdicts of UNCHANGED docs in its cluster.
  */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  private val vcols =
    Seq("doc_id", "lang_ok", "quality_ok", "rep_ok", "decon_ok",
      "dedup_ok", "keep")

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  test("sf0.001: incremental verdicts equal the full recompute " +
      "bit-for-bit, and every surviving status is represented") {
    val dir = sf("sf0.001")
    val prev = IC.snapshotPrev(spark, dir)
    val cur = IC.snapshotCur(spark, dir)
    val ev = IC.evalRegistry(spark, dir)
    val art = IC.artifactsOf(prev, ev)
    val inc = IC.incrementalVerdicts(art, prev, cur, ev).cache()

    val got = inc.select(vcols.head, vcols.tail: _*).collect().toSeq
    val want = IC.fullVerdictsOn(cur, ev)
      .select(vcols.head, vcols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(got == want, "incremental must equal the full recompute")
    assert(got.nonEmpty)

    val statuses = inc.select("status").distinct().as[String].collect().toSet
    assert(statuses == Set("added", "changed", "unchanged"),
      s"expected all surviving statuses, got $statuses")
    // removed docs emit no verdict row
    assert(inc.filter($"doc_id" % 7 === 0).count() == 0)
    inc.unpersist()
  }

  test("planted cluster dynamics: removed canonical promotes a new one, " +
      "a changed member leaves, an added member joins — and unchanged " +
      "docs' dedup verdicts flip accordingly") {
    val t = (0 until 20).map(i => s"tok$i").mkString(" ")
    val u = (0 until 20).map(i => s"other$i").mkString(" ")
    val solo = (0 until 20).map(i => s"solo$i").mkString(" ")
    val fresh = (0 until 20).map(i => s"new$i").mkString(" ")
    val prev = docs(Seq(
      (1L, "en", t), (2L, "en", t), (3L, "en", t), // cluster {1,2,3}, canonical 1
      (5L, "en", u), (6L, "en", u), (7L, "en", u), // cluster {5,6,7}, canonical 5
      (9L, "en", solo)))
    val cur = docs(Seq(
      (2L, "en", t), (3L, "en", t), // 1 removed → 2 must become canonical
      (5L, "en", u), (6L, "en", u),
      (7L, "en", fresh),            // changed → leaves the cluster, singleton
      (8L, "en", u),                // added → joins {5,6} as a duplicate
      (9L, "en", solo)))            // untouched singleton
    val ev = docs(Seq.empty)

    val art = IC.artifactsOf(prev, ev)
    // precondition: the prev clusters really are {1,2,3} and {5,6,7}
    val prevComp = art.comp.as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(prevComp(_) == 1L))
    assert(Seq(5L, 6L, 7L).forall(prevComp(_) == 5L))
    assert(prevComp(9L) == 9L)

    val inc = IC.incrementalVerdicts(art, prev, cur, ev)
    val rows = inc.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(5), r.getString(7))).toMap

    assert(rows(2L) == (true, "unchanged"),
      "doc 2 must be PROMOTED to canonical — an unchanged doc whose verdict flips")
    assert(rows(3L) == (false, "unchanged"))
    assert(rows(5L) == (true, "unchanged"))
    assert(rows(6L) == (false, "unchanged"))
    assert(rows(7L) == (true, "changed"), "changed doc left its cluster")
    assert(rows(8L) == (false, "added"), "added duplicate must not be canonical")
    assert(rows(9L) == (true, "unchanged"))

    // and the planted case still equals its full recompute
    val got = inc.select(vcols.head, vcols.tail: _*).collect().toSeq
    val want = IC.fullVerdictsOn(cur, ev)
      .select(vcols.head, vcols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  test("q157 staged-artifact query matches the in-memory incremental path") {
    val dir = sf("sf0.001")
    val viaStage = IC.incrementalCuration(spark, dir).collect().toSeq
    val art = IC.artifactsOf(IC.snapshotPrev(spark, dir),
      IC.evalRegistry(spark, dir))
    val direct = IC.incrementalVerdicts(art, IC.snapshotPrev(spark, dir),
      IC.snapshotCur(spark, dir), IC.evalRegistry(spark, dir))
      .collect().toSeq
    assert(viaStage == direct)
  }
}
