package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, VectorOps}

/** Round-8 additions: matryoshka-truncation recall audit (q287) and
  * k-core peeling (q288).
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ---- q287 matryoshka recall -------------------------------------

  test("q287: full-dim prefix recalls 1.0 exactly; all recalls in [0,1]") {
    for (dir <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val rows = VectorOps.matryoshkaRecall(spark, dir)
        .select($"prefix_dim", $"hits", $"n_queries", $"recall_at_k")
        .as[(Int, Long, Long, Double)].collect()
      assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 64), s"$dir prefixes")
      val full = rows.find(_._1 == 64).get
      assert(full._4 == 1.0, s"$dir full-dim recall ${full._4}")
      rows.foreach { case (d, hits, nq, r) =>
        assert(r >= 0.0 && r <= 1.0, s"$dir d=$d recall $r")
        assert(hits <= nq * 5, s"$dir d=$d hits $hits > ${nq * 5}")
        assert(r == hits.toDouble / (nq * 5).toDouble, s"$dir d=$d ratio")
      }
    }
  }

  test("q287: d=8 hits match a driver-side truncated brute force") {
    val dir = sf("sf0.001")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def topk(d: Int, qi: Long): Seq[Long] =
      e.toSeq.filter(_._1 != qi)
        .map { case (ni, cv) =>
          (ni, VectorOps.cosPrefixes(e(qi), cv, Array(d)).head)
        }
        .sortBy { case (ni, c) => (-c, ni) }.take(5).map(_._1)
    val queries = e.keys.filter(_ < 10).toSeq
    val expected = queries.map { qi =>
      (topk(8, qi).toSet & topk(64, qi).toSet).size
    }.sum
    val got = VectorOps.matryoshkaRecall(spark, dir)
      .filter($"prefix_dim" === 8).select($"hits").as[Long].head()
    assert(got == expected.toLong, s"hits $got != driver $expected")
  }

  test("q287: cosPrefixes' last snapshot equals the full cosOf fold") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val snaps = VectorOps.cosPrefixes(a, b, Array(8, 16, 32, 64))
      assert(snaps(3) == VectorOps.cosOf(a, b))
      assert(snaps(0) ==
        VectorOps.cosOf(a.take(8), b.take(8)))
    }
  }

  // ---- q288 k-core ------------------------------------------------

  test("q288: the 10-round unroll is a fixpoint on every gated fixture") {
    for (dir <- Seq(sf("sf0.001"), sf("sf0.01"), sf("sf0.1"))) {
      val r10 = Graphs.kCore(spark, dir, rounds = 10)
        .as[(Long, Long)].collect().toMap
      val r11 = Graphs.kCore(spark, dir, rounds = 11)
        .as[(Long, Long)].collect().toMap
      assert(r10 == r11,
        s"$dir: peel not converged by round 10 — raise the unroll bound " +
          "in BOTH Graphs.kCore and the q288 oracle")
    }
  }

  test("q288: members have >= k alive neighbors; dropped vertices don't") {
    val dir = sf("sf0.01")
    val k = 2
    val core = Graphs.kCore(spark, dir, k = k).as[(Long, Long)]
      .collect().toMap
    // driver-side reference peel from the same (uncapped) edge set —
    // the fixture guard proves the cap never binds
    val edges = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).values.toSeq
      .flatMap { b =>
        val ps = b.map(_._2).distinct
        for (x <- ps; y <- ps if x != y) yield (x, y)
      }
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    var alive = edges.map(_._1).toSet
    var stable = false
    var degs = Map.empty[Long, Int]
    while (!stable) {
      degs = edges.filter { case (s, d) => alive(s) && alive(d) }
        .groupBy(_._1).map { case (s, es) => s -> es.size }
        .filter(_._2 >= k)
      val next = degs.keySet
      stable = next == alive
      alive = next
    }
    assert(core.keySet == alive, "membership differs from driver peel")
    degs.foreach { case (id, d) =>
      assert(core(id) == d.toLong, s"degree mismatch at $id")
    }
  }

  // ---- q289 tar member walk ---------------------------------------

  test("q289: member counts, sentinel shards, payload heads") {
    val rows = graft.operators.Multimodal.tarMemberWalk(spark, sf("sf0.01"))
      .as[(Long, Int, String, Long, Long, String)].collect()
    val byShard = rows.groupBy(_._1)
    assert(byShard.size == 500)
    byShard.foreach { case (sid, ms) =>
      if (sid % 17 == 0) {
        assert(ms.toSeq == Seq((sid, -1, "", -1L, -1L, "")),
          s"shard $sid should be the truncation sentinel")
      } else {
        assert(ms.length == (sid % 3 + 2).toInt, s"shard $sid members")
        ms.sortBy(_._2).zipWithIndex.foreach { case (m, i) =>
          assert(m._2 == i, s"shard $sid member order")
          assert(m._3 == s"s$sid/d$i." +
            Seq("txt", "json", "jpg")(i % 3), s"shard $sid name")
          assert(m._4 == (sid * 31 + i * 17) % 200, s"shard $sid size")
          assert(m._6.length == math.min(16L, m._4 * 2).toInt,
            s"shard $sid payload head length")
          assert(m._5 % 512 == 0 && m._5 >= 512,
            s"shard $sid data offset alignment")
        }
      }
    }
  }

  test("q289: GNU tar lists the same members (external cross-check)") {
    import scala.sys.process._
    val shard = graft.operators.Multimodal
      .syntheticTarShards(spark, 30)
      .filter($"shard_id" === 25)
      .select($"bytes").as[Array[Byte]].head()
    val f = java.io.File.createTempFile("graft_shard", ".tar")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, shard)
    val listed = Seq("tar", "-tf", f.getPath).!!.trim
      .split("\n").toSeq
    val walked = graft.operators.Multimodal.tarMemberWalk(spark, sf("sf0.01"))
      .filter($"shard_id" === 25).orderBy($"member_idx")
      .select($"name").as[String].collect().toSeq
    assert(listed == walked,
      s"GNU tar sees $listed, the walker sees $walked")
    // and GNU tar must read back the exact member payload we indexed
    val sz = (25 * 31 + 0 * 17) % 200
    val extracted = (Seq("tar", "-xOf", f.getPath, walked.head) #>
      new java.io.File("/dev/null")).! // exit 0 = checksum+structure OK
    assert(extracted == 0, "tar -xOf failed on the generated shard")
    assert(sz == 175)
  }

  // ---- q290 RRF fusion ----------------------------------------------

  test("q290: rrf math, rank bounds, and both-system dominance") {
    val dir = sf("sf0.01")
    val rows = graft.operators.Retrieval.rrfFusion(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rank, _, lr, dr, rrf9, score) =>
      assert(rank >= 1 && rank <= 5)
      assert(lr == -1 || (lr >= 1 && lr <= 20))
      assert(dr == -1 || (dr >= 1 && dr <= 20))
      assert(lr != -1 || dr != -1, "a fused row must come from a system")
      val expect = (if (lr > 0) 1000000000L / (60 + lr) else 0L) +
        (if (dr > 0) 1000000000L / (60 + dr) else 0L)
      assert(rrf9 == expect, "rrf9 must be the exact integer quotients")
      assert(score == rrf9.toDouble / 1e9)
    }
    // a doc ranked #1 by BOTH systems must be fused #1 for its query
    rows.groupBy(_._1).foreach { case (_, qr) =>
      qr.find(r => r._4 == 1 && r._5 == 1)
        .foreach(r => assert(r._2 == 1L, "double-#1 doc not fused #1"))
    }
  }

  // ---- q291 epoch-mix plan -------------------------------------------

  test("q291: plan arithmetic invariants") {
    val dir = sf("sf0.01")
    val rows = graft.operators.TextOps.epochMixPlan(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Boolean, Long)].collect()
    assert(rows.nonEmpty)
    val target = rows.head._4
    rows.foreach { case (_, _, toks, tgt, rep, planned, capped, short) =>
      assert(tgt == target, "uniform per-source targets")
      assert(rep >= 0 && rep <= 4000000L)
      assert(capped == (rep == 4000000L))
      assert(planned == toks * rep / 1000000L)
      assert(short == tgt - planned && (capped || short >= 0))
      // uncapped sources fill their target up to integer-floor slack
      if (!capped) assert(short <= toks / 1000000L + 1,
        s"uncapped source leaves more than floor slack: $short")
    }
  }
}
