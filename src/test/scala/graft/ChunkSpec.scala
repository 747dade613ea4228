package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Invariants for the LLM-style document chunker (q93). */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("chunkDocs: full coverage, correct overlap, exact reconstruction") {
    val chunks = TextOps.chunkDocs(spark, dir, chunkSize = 50, stride = 40)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1))).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val rows = chunks(id)
      // chunk count = ceil(n / stride)
      assert(rows.length == (toks.length + 39) / 40, s"doc $id count")
      rows.zipWithIndex.foreach { case (r, i) =>
        val off = i * 40
        val expect = toks.slice(off, off + 50)
        assert(r.getString(3) == expect.mkString(" "), s"doc $id chunk $i")
        assert(r.getLong(2) == expect.length, s"doc $id chunk $i n_tokens")
      }
      // stride-prefix concatenation reconstructs the document exactly
      val rebuilt = rows.map(_.getString(3).split(" ", -1).take(40))
        .flatten.mkString(" ")
      // the last chunk may extend past its stride prefix; rebuild via
      // distinct token positions instead for the tail
      val fromChunks = rows.zipWithIndex.flatMap { case (r, i) =>
        r.getString(3).split(" ", -1).zipWithIndex.map { case (t, j) =>
          (i * 40 + j) -> t
        }
      }.toMap
      assert(fromChunks.toSeq.sortBy(_._1).map(_._2).mkString(" ") == text,
        s"doc $id reconstruction")
      assert(rebuilt.startsWith(text.split(" ", -1).take(40).mkString(" ")))
    }
  }
}
