package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PERSISTED IVF index: the multi-probe nearest-centroid assignment
  * (`vec_id, cid, embedding` — [[graft.operators.VectorOps.ivfAssign]])
  * written ONCE as a cid-bucketed, cid-sorted table via the same
  * [[Bucketing.ensure]] layout the fact⋈fact join uses (q125).
  *
  * This turns q141's documented 100 TB story into the executable path:
  * candidate generation is a SELF-join of this table on `cid`, and
  * because both sides read the same bucketed layout, the join plans
  * with NO exchange on either side (IvfIndexSpec asserts it) — the
  * corpus-sized shuffle that dominates a live-assignment run happens
  * once at index-build time and never again. Queries that probe a
  * centroid subset prune buckets on the same key. FAISS persists its
  * IVF lists for exactly this reason; the Spark-native equivalent is a
  * bucketed table, not a custom file format.
  *
  * Everything here is deterministic (fixed centroids, fixed tiebreaks),
  * so a table read back is bit-identical to a live assignment and the
  * DuckDB oracle replays it without knowing the index exists.
  */
object IvfIndex {

  /** Read the index for `dir`, building it on first use (per catalog:
    * table in catalog → reuse; surviving files → re-register; else one
    * bucketed write). The name carries the assignment parameters
    * (indexes with different (nCentroids, nProbe) are different
    * tables) and the FIXTURE CONTENT SIGNATURE (a regenerated
    * embeddings file gets a fresh table — surviving files of the old
    * one can never serve a stale index to a new JVM). Cross-JVM build
    * races are serialized by [[Bucketing.ensure]]'s file lock, so the
    * shared path lets the build amortize across every probe/dedup run
    * in every process; stale-generation dirs are bounded by fixture
    * regenerations (~once per round), not by run count. */
  def table(spark: SparkSession, dir: String,
      nCentroids: Int, nProbe: Int): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sig = graft.streaming.FixtureStaging
      .key("ivfidx", s"$dir/embeddings.parquet")
    val name = s"b_ivf_c${nCentroids}_p${nProbe}_s${sig}_$tag"
    Bucketing.ensure(spark, name,
      graft.operators.VectorOps.ivfAssign(spark,
        Tables.embeddings(spark, dir), nCentroids, nProbe),
      "cid",
      sweep = Some((s"b_ivf_c${nCentroids}_p${nProbe}_s", s"_$tag")))
    spark.table(name)
  }
}
