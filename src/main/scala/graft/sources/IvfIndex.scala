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

  /** The ONE index artifact a deployment actually runs (q163) — the
    * four IVF verbs composed behind a single handle instead of four
    * query families:
    *
    *   - TRAINED: centroids come from the Lloyd trainer run on the
    *     corpus as of build time (the prev snapshot, q155's trainer);
    *   - PERSISTED: the single-probe assignment of that corpus is
    *     written once as a cid-bucketed table (q153's layout);
    *   - MAINTAINED: later arrivals (the delta) assign against the
    *     FROZEN trained centroids and APPEND into the same bucketed
    *     layout (q158's frozen-centroid contract) — a bucketed
    *     `mode("append")` write, no corpus rewrite, no re-train;
    *   - SERVED: queries probe their nProbe nearest trained centroids
    *     and read ONLY those buckets (q161's literal-IN bucket
    *     pruning — [[graft.operators.VectorOps.ivfKnnUnified]]).
    *
    * Everything is deterministic (fixed init, fixed iteration count,
    * integer-sum Lloyd updates, fixed tiebreaks), so prev-assign ∪
    * delta-assign is row-identical to a from-scratch full assignment —
    * the DuckDB oracle replays training + full assignment + probes
    * without knowing the index, the append, or the buckets exist.
    *
    * Build is two writes (initial + append), so the reuse marker is
    * written only after BOTH complete — a crash between them leaves no
    * marker and the next builder rebuilds from scratch; cross-JVM races
    * serialize on the same per-name file lock as [[Bucketing.ensure]].
    */
  case class Handle(table: DataFrame,
      centroids: Array[(Long, Array[Double])])

  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, Array[(Long, Array[Double])]]()

  def unified(spark: SparkSession, dir: String,
      nCentroidsArg: Int, iters: Int): Handle = {
    import org.apache.spark.sql.functions.col
    val V = graft.operators.VectorOps
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sig = graft.streaming.FixtureStaging
      .key("ivfuni", s"$dir/embeddings.parquet")
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    // Build-time √n coarse-quantizer policy: the AdaptiveCentroids
    // sentinel resolves K from the corpus count AS OF BUILD TIME
    // (V.adaptiveK — 16 at the gate SFs, ~√n beyond), and the resolved
    // K is baked into the table name, so an index built at one corpus
    // size is never silently served at another K.
    val nCentroids =
      if (nCentroidsArg == V.AdaptiveCentroids) V.adaptiveK(all.count())
      else nCentroidsArg
    val name = s"b_ivfu_c${nCentroids}_i${iters}_s${sig}_$tag"
    val prev = all.filter(col("vec_id") % 6 =!= 0)
    val delta = all.filter(col("vec_id") % 6 === 0)
    // trained once per (fixture signature, JVM): K×dim doubles
    val cents = centroidCache.computeIfAbsent(name,
      _ => V.trainCentroidsOn(prev, nCentroids, iters))

    val mon = Bucketing.lockFor(name)
    mon.synchronized {
      if (!spark.catalog.tableExists(name)) {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(s"$base/$name.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.lock()
        try {
          val path = s"$base/$name"
          val complete = new java.io.File(path, "_GRAFT_COMPLETE")
          if (complete.exists()) {
            val schema = V.ivfAssignTrained(spark, prev.limit(0),
              cents, 1).schema
            spark.sql(s"CREATE TABLE $name (${schema.toDDL}) USING PARQUET " +
              s"CLUSTERED BY (cid) SORTED BY (cid) " +
              s"INTO ${Bucketing.NumBuckets} BUCKETS LOCATION '$path'")
          } else {
            // stale generations of this logical index + half-built dirs
            Option(new java.io.File(base).listFiles())
              .getOrElse(Array.empty)
              .filter { f =>
                val n = f.getName.stripSuffix(".lock")
                n != name &&
                  n.startsWith(s"b_ivfu_c${nCentroids}_i${iters}_s") &&
                  n.endsWith(s"_$tag")
              }
              .foreach(org.apache.commons.io.FileUtils.deleteQuietly(_))
            org.apache.commons.io.FileUtils
              .deleteDirectory(new java.io.File(path))
            // build: persist the prev corpus's trained assignment...
            V.ivfAssignTrained(spark, prev, cents, 1)
              .repartition(Bucketing.NumBuckets, col("cid"))
              .write.bucketBy(Bucketing.NumBuckets, "cid").sortBy("cid")
              .option("path", path).mode("overwrite").saveAsTable(name)
            // ...then MAINTAIN: bucketed append of the delta, assigned
            // against the frozen centroids — rows land in their buckets,
            // nothing already written moves
            V.ivfAssignTrained(spark, delta, cents, 1)
              .repartition(Bucketing.NumBuckets, col("cid"))
              .write.bucketBy(Bucketing.NumBuckets, "cid").sortBy("cid")
              .mode("append").saveAsTable(name)
            complete.createNewFile()
          }
        } finally {
          lock.release()
          ch.close()
        }
      }
    }
    Handle(spark.table(name), cents)
  }
}
