package graft

import org.apache.spark.sql.functions._

/** End-to-end contract of the one-command corpus pipeline: row
  * accounting stage to stage, shard layout on disk, pack budget
  * discipline on the final training set, and bit-level rerun
  * idempotence (the whole chain is hash-driven, so a rerun must
  * reproduce every assignment).
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")
  private val out = java.nio.file.Files
    .createTempDirectory("graft_training_pipe").toString

  test("stage row accounting, shard layout, pack discipline, " +
      "idempotent rerun") {
    val r = TrainingPipeline.run(spark, dir, out, nShards = 4,
      packBudget = 200)

    // verdicts cover exactly the train (non-eval) docs
    val trainDocs = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 25 =!= 0).count()
    assert(r.verdicts.count() == trainDocs)
    // kept = the multilingual criteria (lang selection is replaced by
    // the balancing stage); mixed is a REAL subset; training = mixed
    assert(r.kept.count() == r.verdicts.filter($"quality_ok"
      && $"rep_ok" && $"decon_ok" && $"dedup_ok").count())
    assert(r.mixed.count() < r.kept.count(),
      "mixture stage cut nothing — vacuous composition")
    assert(r.mixed.join(r.kept, "doc_id").count() == r.mixed.count())
    assert(r.training.count() == r.mixed.count())

    // disk layout: one directory per shard, shard sizes within 1
    val shardDirs = new java.io.File(s"$out/training_shards")
      .listFiles().filter(_.getName.startsWith("shard=")).map(_.getName)
    val sizes = r.training.groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(shardDirs.length == sizes.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    // positions dense within shard (the trainer's read order)
    assert(r.training.groupBy("shard")
      .agg(max("pos").as("hi"), count(lit(1)).as("n"))
      .filter($"hi" =!= $"n" - 1).count() == 0)

    // pack discipline holds on the final set: a pack never exceeds
    // budget + its own largest document; pack identity is
    // (shard, source, pack_id) and packs NEVER span shard directories —
    // a worker reading one shard sees only complete packs
    val packs = r.training.groupBy("shard", "source", "pack_id")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
    assert(packs.filter($"t" > lit(200) + $"m").count() == 0)
    // cross-check: no (source, pack_id) pair straddles shards within
    // the per-shard scoping (identity includes shard, so this asserts
    // the window really was partitioned by shard)
    assert(r.training.select("shard", "source", "pack_id").distinct()
      .count() == packs.count())

    // rerun reproduces every assignment bit-for-bit (materialize the
    // first run's assignments before the overwrite invalidates its
    // file listing)
    val first = r.training.select("doc_id", "shard", "pos", "pack_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    val r2 = TrainingPipeline.run(spark, dir, out, nShards = 4,
      packBudget = 200)
    val second = r2.training.select("doc_id", "shard", "pos", "pack_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(second == first)
  }
}
