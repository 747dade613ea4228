package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingBm25Index

/** q292 — BM25 served from the delete-maintained full inverted index.
  * Pins (1) the maintained postings/doclen/totals state equals a
  * from-scratch derivation over the post-epoch corpus (full-state
  * equality, not just the query slice), (2) the published posting
  * table prunes term buckets at PLAN time (strict-subset
  * `SelectedBucketsCount` on a single-term probe — the production
  * serve shape: one query's few terms → few buckets), and (3) the
  * serve's result equals a batch BM25 recompute over the post-epoch
  * corpus bit-for-bit (the oracle gate re-proves this against DuckDB).
  */
class StreamingBm25ServeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def postEpochDocs = graft.sources.Tables.documents(spark, dir)
    .filter(col("doc_id") % 6 === 0 || col("doc_id") % 7 =!= 3)
    .select("doc_id", "text")

  test("maintained postings + doclen + totals state equal a " +
      "from-scratch derivation over the post-epoch corpus") {
    val root = StreamingBm25Index.drainedStateRoot(spark, dir)
    val tf = postEpochDocs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val expectedPost = tf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val gotPost = graft.sources.DeltaLog
      .read(spark, s"$root/state/postings", Seq("t", "doc_id")).get
      .select("t", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPost == expectedPost)
    assert(gotPost.nonEmpty)

    val expectedDl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotDl = graft.sources.DeltaLog
      .read(spark, s"$root/state/doclen", Seq("doc_id")).get
      .select("doc_id", "dl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDl == expectedDl)

    val tot = graft.sources.DeltaLog
      .read(spark, s"$root/state/totals", Seq("k")).get.collect()
    assert(tot.length == 1)
    assert(tot(0).getAs[Long]("nd") == expectedDl.size)
    assert(tot(0).getAs[Long]("nt") == expectedDl.toSeq.map(_._2).sum)
  }

  test("a single-term probe prunes published posting buckets at the scan") {
    val post = StreamingBm25Index.publishedPostings(spark, dir)
    val term = post.select("t").orderBy("t").limit(1)
      .collect()(0).getString(0)
    // the serve's df-count shape (aggregate keyed on the bucket
    // column — a bare filter scan would have its bucketed read
    // disabled by DisableUnnecessaryBucketedScan)
    val plan = post.filter(col("t") === term)
      .groupBy("t").agg(count(lit(1)).as("df"))
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected a strict subset of buckets: ${m.get.matched}")
  }

  test("the serve itself reads the published table BUCKETED — the " +
      "pruning machinery is active in the real plan") {
    // the gate's batched query set covers the whole vocabulary, so
    // the count here is 8-of-8; STRICT pruning under a narrow term
    // set is pinned by the single-term probe above. This test pins
    // that the serve's scan is not silently de-bucketed
    // (DisableUnnecessaryBucketedScan) — i.e. the artifact's pruning
    // would engage for any production single-query term set.
    val plan = StreamingBm25Index.servedBm25(spark, dir)
      .queryExecution.executedPlan.toString
    assert("SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan).isDefined,
      s"expected a bucketed scan in the serve plan:\n$plan")
    assert(!plan.contains("Bucketed: false"),
      "the serve's published-table scan was de-bucketed")
  }

  test("served BM25 equals a from-scratch batch recompute over the " +
      "post-epoch corpus bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val docs = postEpochDocs
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val statsRow = dl.agg(count(lit(1)).as("nd"), sum("dl").as("nt"))
      .collect()(0)
    val nd = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nd
    val q = tf.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"), col("t"))
    val df = tf.join(broadcast(q.select("t").distinct()), "t")
      .groupBy("t").agg(count(lit(1)).as("df"))
    val idf = log(((lit(nd) - col("df")).cast("double") + lit(0.5))
      / (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl))))
    val c9 = floor(idf * tfn * lit(1000000000.0) + lit(0.5)).cast("long")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("s9"), asc("doc_id"))
    val expected = broadcast(q)
      .join(tf, "t")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(df), "t")
      .join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"), c9.as("c9"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c9").as("s9"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("s9").cast("double") / lit(1000000000.0)).as("score"))
      .orderBy("query_id", "rank")
      .collect().toSeq
    val got = StreamingBm25Index.servedBm25(spark, dir).collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("staleness contract: the served artifact's epoch stamp equals " +
      "the state log's last commit, and a stale stamp is read-repaired") {
    val root = StreamingBm25Index.drainedStateRoot(spark, dir)
    val logLast = graft.sources.DeltaLog
      .lastEpoch(spark, s"$root/state/postings").get
    assert(StreamingBm25Index.servedEpoch(spark, dir) == logLast)

    // regress the stamp (a crash between commit and publish): the next
    // serve-path access must rebuild the artifact and restamp
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sig = graft.streaming.FixtureStaging
      .key("bm25pub", s"$dir/documents.parquet")
    val stamp = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/" +
        s"b_bm25pub_s${sig}_$tag/_epoch")
    java.nio.file.Files.write(stamp, "-99".getBytes("UTF-8"))
    assert(StreamingBm25Index.servedEpoch(spark, dir) == logLast,
      "stale artifact was served without repair")
    // the repaired artifact still answers the q292 contract
    assert(StreamingBm25Index.servedBm25(spark, dir).count() > 0)
  }
}
