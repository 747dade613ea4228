package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** q240 exact shared-substring spans: beyond the hash gate, prove the
  * semantic contract — every reported span is VERBATIM-equal text in
  * both documents, maximal (not extendable either direction), and at
  * least k tokens. */
class SharedSubstringSpec extends SparkSpec {
  import spark.implicits._

  test("every span is verbatim-shared, maximal, and >= k tokens") {
    val dir = sf("sf0.001")
    val k = 8
    val spans = TextOps.sharedSubstringSpans(spark, dir, k)
      .collect().toSeq
    assert(spans.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> t.split(" ") }.toMap
    spans.foreach { r =>
      val (ida, idb) = (r.getLong(0), r.getLong(1))
      val (sa, sb, n) = (r.getLong(2).toInt, r.getLong(3).toInt,
        r.getLong(4).toInt)
      assert(n >= k, s"span under $k tokens: $r")
      val (ta, tb) = (docs(ida), docs(idb))
      val (segA, segB) = (ta.slice(sa, sa + n), tb.slice(sb, sb + n))
      assert(segA.sameElements(segB), s"span not verbatim: $r")
      // maximality: extending one token either direction must break
      val leftOk = sa == 0 || sb == 0 || ta(sa - 1) != tb(sb - 1)
      val rightOk = sa + n >= ta.length || sb + n >= tb.length ||
        ta(sa + n) != tb(sb + n)
      assert(leftOk, s"span extendable left: $r")
      assert(rightOk, s"span extendable right: $r")
    }
  }
}
