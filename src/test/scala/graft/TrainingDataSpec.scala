package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, VectorOps}

/** Specs for the round-3 training-data operators: sequence packing,
  * PII redaction, embedding-cosine dedup.
  */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("packDocuments: packs fill the budget and overflow by at most " +
      "one document") {
    val budget = 256
    val packs = TextOps.packDocuments(spark, dir, budget)
      .groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("pack_tokens"),
        max("n_tokens").as("max_doc"),
        count(lit(1)).as("n_docs"))
    // a pack never exceeds budget + its own largest document (the
    // bounded-overflow contract of cumulative-DIV packing; a doc larger
    // than the budget overshoots and the next pack starts as a stub,
    // which is the documented trade vs exact NP-hard bin packing)
    assert(packs.filter($"pack_tokens" > lit(budget) + $"max_doc")
      .count() == 0)
    // pack id is exactly floor(first-doc offset / budget) …
    val docs = TextOps.packDocuments(spark, dir, budget)
    assert(docs.filter($"pack_id" =!= expr(s"tokens_before DIV $budget"))
      .count() == 0)
    // … monotone in doc order within a source, starting at 0
    val mono = docs.withColumn("prev", lag($"pack_id", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter($"prev".isNotNull && $"pack_id" < $"prev")
    assert(mono.count() == 0)
    assert(docs.groupBy("source").agg(min("pack_id").as("lo"))
      .filter($"lo" =!= 0).count() == 0)
    // no document lost or duplicated
    assert(docs.count() ==
      graft.sources.Tables.documents(spark, dir).count())
  }

  test("packing invariants hold for arbitrary token-size distributions " +
      "(property)") {
    // generator-driven like Scd2PropertySpec (the scalatest-scalacheck
    // bridge isn't in the offline cache): random doc counts, token
    // sizes spanning tiny docs to budget-busting giants
    import org.scalacheck.{Gen, rng}
    val budget = 100
    val docsGen = for {
      n <- Gen.choose(0, 60)
      sizes <- Gen.listOfN(n, Gen.oneOf(Gen.choose(1, 30),
        Gen.choose(80, 350))) // mix of small docs and over-budget giants
    } yield sizes
    var seed = rng.Seed(7L)
    def sample(): List[Int] = {
      val v = docsGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
    for (_ <- 1 to 12) {
      val sizes = sample()
      // reference model: sequential cumulative-DIV packing
      val expected = sizes.zipWithIndex.map { case (tk, i) =>
        (i.toLong, tk.toLong, sizes.take(i).map(_.toLong).sum)
      }.map { case (id, tk, before) => (id, tk, before, before / budget) }
      val df = sizes.zipWithIndex
        .map { case (tk, i) => (i.toLong, "s", ("x " * tk).trim) }
        .toDF("doc_id", "source", "text")
      df.createOrReplaceTempView("prop_docs")
      // same expression shape as packDocuments, over the synthetic frame
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(Long.MinValue, -1)
      val got = df.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("tokens_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .withColumn("pack_id", expr(s"tokens_before DIV $budget"))
        .drop("source")
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toList
      assert(got == expected, s"sizes=$sizes")
    }
  }

  test("redactPii: no phone or email survives redaction, flags line up") {
    val out = TextOps.redactPii(spark, dir)
    val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    assert(out.filter($"redacted".rlike(phoneRe)).count() == 0)
    assert(out.filter($"redacted".rlike(emailRe)).count() == 0)
    // fixture construction guarantees one of each per row
    assert(out.filter(!$"had_phone" || !$"had_email").count() == 0)
    assert(out.filter(!$"redacted".contains("[PHONE]") ||
      !$"redacted".contains("[EMAIL]")).count() == 0)
  }

  test("embeddingDedupClusters: canonical is the cluster minimum and " +
      "sizes are consistent") {
    val out = VectorOps.embeddingDedupClusters(spark, dir).cache()
    // component = min member id, exactly one canonical per component
    val bad = out.groupBy("component")
      .agg(min("vec_id").as("mn"), count(lit(1)).as("n"),
        sum($"is_canonical".cast("long")).as("n_canon"))
      .filter($"mn" =!= $"component" || $"n_canon" =!= 1)
    assert(bad.count() == 0)
    // cluster_size matches the component group count on every row
    val sizes = out.groupBy("component").agg(count(lit(1)).as("true_n"))
    assert(out.join(sizes, "component")
      .filter($"cluster_size" =!= $"true_n").count() == 0)
    // dropping non-canonicals keeps exactly one doc per cluster
    val kept = out.filter($"is_canonical")
    assert(kept.count() == out.select("component").distinct().count())
  }

  test("decontaminate: matches a brute-force shared-4-gram check and " +
      "never emits eval documents") {
    val out = TextOps.decontaminate(spark, dir).cache()
    assert(out.filter($"doc_id" % 25 === 0).count() == 0)
    // brute force over the (small-SF) corpus
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 4) Set.empty
      else w.sliding(4).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(_._1 % 25 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 25 != 0)
      .map { case (id, t) => id -> grams(t).count(evalGrams.contains) }
      .toMap
    val got = out.select("doc_id", "contaminated_grams")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == expected.keySet)
    val diffs = expected.collect {
      case (id, n) if got(id) != n.toLong => (id, n, got(id))
    }
    assert(diffs.isEmpty, s"mismatches: ${diffs.take(5)}")
    assert(expected.values.exists(_ > 0),
      "fixture produced zero contamination — the test is vacuous")
    out.unpersist()
  }

  test("repetitionStats: fraction invariants and a hand-checked document") {
    val out = TextOps.repetitionStats(spark, dir).cache()
    assert(out.count() ==
      graft.sources.Tables.documents(spark, dir).count())
    assert(out.filter($"tri_distinct" > $"tri_total").count() == 0)
    assert(out.filter($"dup_tri_frac" < 0 || $"dup_tri_frac" > 1
      || $"top_bi_frac" < 0 || $"top_bi_frac" > 1).count() == 0)
    // brute-force one document
    val (id, text) = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].head()
    val w = text.split(" ")
    val tris = w.sliding(3).map(_.mkString(" ")).toSeq
    val bis = w.sliding(2).map(_.mkString(" ")).toSeq
    val row = out.filter($"doc_id" === id).head()
    assert(row.getAs[Long]("tri_total") == tris.size)
    assert(row.getAs[Long]("tri_distinct") == tris.distinct.size)
    val topBi = bis.groupBy(identity).values.map(_.size).max
    val expFrac = math.floor(topBi.toDouble / bis.size * 1e6 + 0.5) / 1e6
    assert(row.getAs[Double]("top_bi_frac") == expFrac)
    out.unpersist()
  }

  test("shuffleShard: balanced within one row, dense positions, " +
      "deterministic across runs") {
    val n = 8
    val out = TextOps.shuffleShard(spark, dir, n).cache()
    val total = graft.sources.Tables.documents(spark, dir).count()
    assert(out.count() == total)
    // round-robin over the global rank balances shards to within 1
    val sizes = out.groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(sizes.length == math.min(n, total).toInt)
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    // positions are dense 0..size-1 within each shard
    val dense = out.groupBy("shard")
      .agg(min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"), count(lit(1)).as("cnt"))
      .filter($"lo" =!= 0 || $"hi" =!= $"cnt" - 1 || $"nd" =!= $"cnt")
    assert(dense.count() == 0)
    // reproducible: a second evaluation assigns every doc identically
    val again = TextOps.shuffleShard(spark, dir, n)
    assert(out.join(again, Seq("doc_id", "shard", "pos")).count() == total)
    out.unpersist()
  }

  test("curation chain: verdicts agree with the standalone stages, " +
      "funnel is monotone and consistent") {
    val v = TextOps.curationVerdicts(spark, dir).cache()
    // no eval documents, keep = conjunction
    assert(v.filter($"doc_id" % 25 === 0).count() == 0)
    assert(v.filter($"keep" =!= ($"lang_ok" && $"quality_ok" && $"rep_ok"
      && $"decon_ok" && $"dedup_ok")).count() == 0)
    // stage verdicts equal the standalone gated operators
    val rep = TextOps.repetitionStats(spark, dir)
      .select($"doc_id", $"keep".as("exp_rep"))
    assert(v.join(rep, "doc_id").filter($"rep_ok" =!= $"exp_rep")
      .count() == 0)
    val dec = TextOps.decontaminate(spark, dir)
      .select($"doc_id", (!$"is_contaminated").as("exp_dec"))
    assert(v.join(dec, "doc_id").filter($"decon_ok" =!= $"exp_dec")
      .count() == 0)
    // funnel counts recompute from the verdict table and never increase
    val f = TextOps.curationFunnel(spark, dir)
      .orderBy("stage_no").collect()
    assert(f.map(_.getAs[String]("stage")).toSeq == Seq("ingest", "lang",
      "quality", "repetition", "decontamination", "dedup"))
    val s = f.map(_.getAs[Long]("survivors"))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${s.toSeq}")
    assert(s(0) == v.count())
    assert(s(5) == v.filter($"keep").count())
    v.unpersist()
  }

  test("langMixture: thresholds are exact integer rates and kept " +
      "counts land in the binomial 5-sigma envelope") {
    val out = TextOps.langMixture(spark, dir).cache()
    val minCnt = out.agg(min("cnt")).as[Long].head()
    // threshold math is exact integer arithmetic
    assert(out.filter($"mix_threshold" =!=
      expr(s"${minCnt}L * 1000000L DIV cnt")).count() == 0)
    // the smallest language keeps (virtually) everything; each language
    // keeps ~rate × count, binomially concentrated
    val per = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum($"keep".cast("long")).as("kept"),
        first("mix_threshold").as("thr"))
      .collect()
    per.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val p = r.getAs[Long]("thr").toDouble / 1e6
      val kept = r.getAs[Long]("kept").toDouble
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(kept - n * p) <= 5 * sd + 1,
        s"${r.getAs[String]("lang")}: kept $kept vs mean ${n * p} (sd $sd)")
    }
    // deterministic: re-evaluation gives the identical verdict set
    val again = TextOps.langMixture(spark, dir)
    assert(out.join(again, Seq("doc_id", "keep")).count() == out.count())
    out.unpersist()
  }

  test("streaming doc dedup: doubled delivery collapses to batch " +
      "distinct-content stats (and the doubling is real)") {
    val out = graft.streaming.StreamingDedup.dedupedDocStats(spark, dir)
    val batch = graft.sources.Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(regexp_replace(lower($"text"), "\\s+", " "), " "))
          .cast("long")).as("n_tokens"))
    assert(out.join(batch.withColumnRenamed("n_docs", "bd")
        .withColumnRenamed("n_tokens", "bt"), "source")
      .filter($"n_docs" =!= $"bd" || $"n_tokens" =!= $"bt")
      .count() == 0)
    // non-vacuous: the staged landing dir really delivers every doc twice
    // (same content-signature key dupDocDir stages under)
    val key = graft.streaming.FixtureStaging.key(
      "dupdoc", s"$dir/documents.parquet")
    val staged = spark.read.parquet(s"/tmp/graft-stream-dupdoc-$key")
    assert(staged.count() ==
      2 * graft.sources.Tables.documents(spark, dir).count())
  }

  test("sentimentLexiconScore: hand-checked docs, label/score coherence, " +
      "and the scan-local form equals an explicit explode+join") {
    val out = TextOps.sentimentLexiconScore(spark, dir)
    // hand-check one planted doc end to end
    val local = s"${System.getProperty("java.io.tmpdir")}/graft-sentiment"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(local))
    Seq(
      (0L, "fast fast slow value", "en", "web", 20L),  // 2+2-2+1 = +3
      (1L, "slow dup slow", "en", "web", 13L),         // -2-1-2 = -5
      (2L, "table scan merge", "en", "web", 16L))      // 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$local/documents.parquet")
    val hand = TextOps.sentimentLexiconScore(spark, local)
      .select("doc_id", "n_tokens", "sentiment_raw", "label")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(hand == Seq((0L, 4L, 3L, "positive"),
      (1L, 3L, -5L, "negative"), (2L, 3L, 0L, "neutral")))

    // coherence on the real corpus: label always matches the sign
    assert(out.filter(($"sentiment_raw" > 0 && $"label" =!= "positive")
      || ($"sentiment_raw" < 0 && $"label" =!= "negative")
      || ($"sentiment_raw" === 0 && $"label" =!= "neutral")).count() == 0)

    // the scan-local aggregate-lambda form equals the explode + lexicon
    // join a large-lexicon deployment would run (the oracle's shape)
    val lex = TextOps.sentimentLex.toDF("t", "w")
    val joined = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .join(broadcast(lex), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(coalesce(sum($"w"), lit(0L)).as("jraw"))
    assert(out.join(joined, "doc_id")
      .filter($"sentiment_raw" =!= $"jraw").count() == 0)
  }
}
