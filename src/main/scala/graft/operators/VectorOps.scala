package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Similarity search over embedding columns (`Array[Float]`) — the
  * ANN surface a training-data pipeline needs (north-star extensions,
  * SURVEY §7.1.8).
  *
  * Math is pure `zip_with` + left-fold `aggregate` over the arrays:
  * codegen-friendly, no UDFs, and fold order matches DuckDB's
  * `list_reduce`, so cosine values are bit-reproducible in the oracle.
  *
  * Scale shapes:
  *  - brute-force top-k = broadcast the (small) query set against the
  *    corpus → per-partition partial top-k → global top-k (Spark's
  *    window-filter plans as shuffle of only candidate rows; with a
  *    `limit` it's TakeOrderedAndProject's heap pattern);
  *  - the LSH variant buckets by hyperplane sign bits so candidate
  *    generation is an equi-join on band keys — the 100 TB path where
  *    all-pairs is impossible.
  */
object VectorOps {

  /** Left-fold dot product over two equal-length arrays, in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** JVM-side cosine identical to the Column form and the oracle's
    * `list_reduce` folds: left-to-right double accumulation from 0.0,
    * float operands promoted per element. Typed kernels are used for
    * the O(N·Q) pair math because Catalyst higher-order lambdas run
    * interpreted and optimizer rules (CollapseProject, filter pushdown
    * into the non-equi join condition) re-evaluate the fold per
    * reference — measured 1.6s → 94s plan-shape flips at sf0.1. */
  def cosOf(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force cosine top-k: query vectors (vec_id < nQueries)
    * against the whole corpus. The query set is broadcast; the per-pair
    * math is a typed kernel; ranking uses a per-query window with a
    * deterministic tiebreak. */
  def knnCosine(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val pairs = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) => (qi, ni, cosOf(qv, cv)) })
      .toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Exact integer dot product (left-to-right, any order is exact). */
  def dotL(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** q166: int8 scalar-quantized embeddings + asymmetric-distance serve.
    * Each vector is compressed to one signed-byte code per dimension
    * with a per-vector max-abs scale (`code = floor(x/scale*127 + .5)`),
    * a 4× storage/I/O reduction on a float corpus; approximate cosine is
    * served straight from the integer codes (the per-vector scales
    * cancel in the cosine ratio), with the exact float cosine alongside
    * so the gate pins the quantization error itself.
    *
    * Scale shape: quantization is one map stage (scan-local, no
    * shuffle) — at 100 TB the codes table is what lands on disk and the
    * float column is dropped; serving reads a quarter of the bytes and
    * the integer dot kernel vectorizes. The query set broadcasts
    * exactly as [[knnCosine]]; ranking is the same per-query window.
    * All arithmetic is exact-integer or single deterministic IEEE ops,
    * so the DuckDB oracle reproduces every ulp.
    */
  def int8Knn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val m = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val coded = e
      .withColumn("scale", when(m === lit(0.0), lit(1.0)).otherwise(m))
      .withColumn("codes", transform(col("embedding"),
        x => floor(x.cast("double") / col("scale") * lit(127.0) + lit(0.5))
          .cast("long")))
      .withColumn("n8", aggregate(col("codes"), lit(0L),
        (acc, v) => acc + v * v))
      .select(col("vec_id"), col("embedding"), col("codes"), col("n8"))
    val q = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("codes").as("qc"), col("n8").as("qn"))
    val c = coded
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("codes").as("cc"), col("n8").as("cn"))
    val pairs = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("qc"), col("cc"), col("qn"), col("cn"), col("qv"), col("cv"))
      .as[(Long, Long, Array[Long], Array[Long], Long, Long,
        Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qc, cc, qn, cn, qv, cv) =>
        val cosq = dotL(qc, cc).toDouble /
          (math.sqrt(qn.toDouble) * math.sqrt(cn.toDouble))
        (qi, ni, cosq, cosOf(qv, cv))
      })
      .toDF("query_id", "neighbor_id", "cosq", "cosf")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosq"), asc("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cosq")).as("cos_q8"),
        graft.util.Portable.val6(col("cosf")).as("cos_f32"))
      .orderBy("query_id", "rank")
  }

  /** Bounded all-pairs similarity (exact baseline for the LSH path). */
  def embeddingPairs(spark: SparkSession, dir: String,
      maxId: Long = 500, threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < maxId)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"), col("va"), col("vb"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (x, y, va, vb) => (x, y, cosOf(va, vb)) })
      .toDF("ida", "idb", "cos")
      .filter(col("cos") >= threshold)
      .select(col("ida"), col("idb"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("ida", "idb")
  }

  /** Embedding-cosine near-duplicate DEDUP (the verdict layer over
    * [[embeddingPairs]]): cosine pairs above the threshold close into
    * clusters via connected components, and every vector gets its
    * canonical representative (min vec_id), cluster size, and keep/drop
    * flag — the semantic-dedup step modern training pipelines run after
    * lexical MinHash. The bounded exact pair scan is the oracle-able
    * baseline; at corpus scale the pair input swaps to the LSH-bucketed
    * ([[lshNearDups]]) or IVF-bucketed candidates with this closure and
    * verdict unchanged. */
  def embeddingDedupClusters(spark: SparkSession, dir: String,
      maxId: Long = 500, threshold: Double = 0.4): DataFrame = {
    val pairs = embeddingPairs(spark, dir, maxId, threshold)
      .select("ida", "idb")
    // componentsAuto: identical min-label closure; the bounded pair set
    // (id-capped by construction) closes driver-side in 2 jobs instead
    // of O(diameter) distributed rounds
    val comp = Graphs.componentsAuto(pairs, "ida", "idb")
      .withColumnRenamed("id", "vec_id")
    Tables.embeddings(spark, dir).filter(col("vec_id") < maxId)
      .select("vec_id")
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .orderBy("vec_id")
  }

  /** At-scale embedding near-duplicate dedup (q141, the capstone of the
    * LLM-pipeline brief): candidate generation over the FULL embeddings
    * table — no id cap anywhere — via IVF bucketing, closure via
    * connected components, canonical-representative verdict per vector.
    *
    * [[embeddingDedupClusters]] (q138) is the bounded EXACT baseline:
    * its all-pairs candidate generator is quadratic and only runs under
    * an id cap. This is the operator you actually run at corpus scale:
    *
    *  1. nearest-centroid assignment (same deterministic centroids and
    *     argmax as [[ivfKnn]]) — ONE map-only pass, no shuffle;
    *  2. candidates = pairs sharing a bucket — an EQUI-JOIN on the
    *     centroid id (PlanAuditSpec: no BNLJ, no cartesian), so pair
    *     work is Σ bucket² instead of N²; the miss set (near-dups whose
    *     members land in different buckets) is the documented recall
    *     trade every ANN-based dedup makes, and is deterministic here,
    *     so the oracle replays it exactly. `nProbe` = 4 assigns each
    *     vector to its 4 nearest centroids — measured pair recall 0.94
    *     at sf0.1 vs 0.20 single-probe (VectorDedupSpec pins the
    *     curve), the standard IVF recall lever at 4× assignment cost;
    *  3. cosine filter at `threshold` with the shared typed kernel;
    *  4. [[Graphs.components]] closes candidate pairs into clusters;
    *     every vector gets (component, cluster_size, is_canonical).
    *
    * At 100 TB: the assignment is written once as a cid-bucketed table
    * (the IVF index), the self-join co-locates on cid with zero
    * exchange, and components runs its label-propagation rounds over
    * the candidate edges only — each stage is the shape that already
    * ships here, just with the write in between. */
  def embeddingDedupIvf(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, threshold: Double = 0.4,
      nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val k = resolveK(spark, dir, nCentroids)
    val pairs = ivfCandidatePairs(spark, e, k, threshold, nProbe)
    dedupVerdict(e.select("vec_id"), pairs)
  }

  /** Sentinel default for `nCentroids`: derive K from the corpus size
    * at build time via [[adaptiveK]] instead of a fixed literal. */
  val AdaptiveCentroids: Int = -1

  /** The √n-class coarse-quantizer policy (the round-7 probe's named
    * fix for the q141/q153 exponents): K = max(16, ⌈√(n/8)⌉). Fixed
    * K=16 over a growing corpus makes bucket sizes grow ~n and
    * bucket-local pair work ~n² — the regime every IVF deployment
    * avoids by growing the centroid count with the corpus (FAISS's
    * nlist ~ √n guidance). The 1/8 calibration puts the gate corpora
    * (500/500/2000 vectors) exactly at the 16 floor, so every DuckDB
    * oracle's literal-16 centroid set stays bit-identical; the 10×
    * ScaleGen fixture (20k vectors) resolves to K=50 and the 100×
    * fixture to K=159 — bucket-local pair work then grows ~n·√n
    * instead of ~n². */
  def adaptiveK(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n / 8.0)).toInt)

  /** Resolve an `nCentroids` argument: the [[AdaptiveCentroids]]
    * sentinel reads the corpus count (a parquet-metadata-cheap action,
    * paid once per index build / dedup run) through [[adaptiveK]];
    * explicit values pass through untouched. */
  private def resolveK(spark: SparkSession, dir: String,
      nCentroids: Int): Int =
    if (nCentroids == AdaptiveCentroids)
      adaptiveK(Tables.embeddings(spark, dir).count())
    else nCentroids

  /** The verdict layer shared by every dedup variant: close candidate
    * pairs into clusters ([[Graphs.components]]) and give every id its
    * canonical representative (min id), cluster size, and keep flag. */
  def dedupVerdict(ids: DataFrame, pairs: DataFrame): DataFrame = {
    // componentsAuto (r10): near-dup pair graphs are cluster-sized —
    // orders of magnitude below the corpus — so the closure usually
    // fits the driver escape hatch (identical min-label semantics,
    // 2 jobs); a pair set above the bound runs the unchanged
    // distributed loop. Measured: q141 5.1 → (see OPTIMIZATION_r10.md)
    val comp = Graphs.componentsAuto(pairs, "ida", "idb")
      .withColumnRenamed("id", "vec_id")
    ids
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .orderBy("vec_id")
  }

  /** At-scale embedding dedup against the PERSISTED IVF index (q153):
    * semantically identical to [[embeddingDedupIvf]] — same assignment,
    * same candidates, same closure, same verdict, same oracle — but the
    * multi-probe assignment is written ONCE as a cid-bucketed table
    * ([[graft.sources.IvfIndex]]) and the Σ bucket² candidate self-join
    * reads co-located buckets with NO exchange on either side
    * (IvfIndexSpec pins the exchange-free join subtree, the same
    * assertion BucketedJoinSpec makes for the fact⋈fact join).
    *
    * This is the 100 TB deployment shape the q141 Scaladoc promises:
    * build the index once (one map-only assignment pass + one bucketed
    * write), then every dedup/ANN run over it joins bucket-to-bucket
    * without reshuffling the corpus — the index write amortizes across
    * every downstream probe. */
  def embeddingDedupIvfIndexed(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, threshold: Double = 0.4,
      nProbe: Int = 4, maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val assigned = graft.sources.IvfIndex.table(spark, dir,
      resolveK(spark, dir, nCentroids), nProbe)
    val pairs =
      pairsFromAssigned(assigned, threshold, nProbe, maxBucket)
    val ids = Tables.embeddings(spark, dir).select("vec_id")
    dedupVerdict(ids, pairs)
  }

  /** Asymmetric candidate scoring for index maintenance: DELTA
    * assignment rows probe the full index on cid. The delta side is
    * BROADCAST (small by contract — a daily append vs the corpus), so
    * the join adds NO shuffle on the index side at any scale; scoring is
    * the same codegen'd CosineSim as [[pairsFromAssigned]].
    *
    * `frozenCensus`: the index's build-time bucket census, when the
    * skew cap must stay ACTIVE under maintenance — both sides sub-split
    * with the same frozen map ([[withFrozenBucketCap]]), so the probe
    * emits exactly the pairs a full capped pass against that census
    * would. None (the gated q158 path) leaves the cap out entirely —
    * the stored pairs are uncapped, so the probe must be too. */
  def deltaPairs(deltaAssigned: DataFrame, indexAssigned: DataFrame,
      threshold: Double, frozenCensus: Option[DataFrame] = None): DataFrame = {
    val (l0, r0, joinKeys) = frozenCensus match {
      case Some(c) => (
        withFrozenBucketCap(deltaAssigned, Seq("cid"), "vec_id", c,
          broadcastCensus = true),
        withFrozenBucketCap(indexAssigned, Seq("cid"), "vec_id", c,
          broadcastCensus = true),
        Seq("cid", "_sub"))
      case None => (deltaAssigned, indexAssigned, Seq("cid"))
    }
    val keep = joinKeys.map(col)
    val l = broadcast(l0.select(keep :+ col("vec_id").as("ida")
      :+ col("embedding").as("va"): _*))
    val r = r0.select(keep :+ col("vec_id").as("idb")
      :+ col("embedding").as("vb"): _*)
    l.join(r, joinKeys)
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("ida"),
        greatest(col("ida"), col("idb")).as("idb"),
        graft.functions.CosineSim.cosineSim(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("ida", "idb").distinct()
  }

  /** Incremental embedding dedup after an index APPEND (q158) — the
    * day-2 operation of the persisted IVF index (q153): new embeddings
    * arrive, get assigned against the index's FROZEN centroids (the
    * prev corpus's first-K — centroid refresh is a separate re-train,
    * q155's story), and only the affected clusters re-close:
    *
    *  1. delta assignment: one map-only pass over DELTA vectors only;
    *  2. new candidate pairs: the broadcast delta probes the index on
    *     cid ([[deltaPairs]]) — zero corpus-side shuffle;
    *  3. stored pairs are append-stable (additions never retire edges),
    *     so a prev cluster is affected iff a new edge touches it;
    *     connected components rerun on the affected subgraph only
    *     (edge-closed: kept edges stay within one prev component, new
    *     edges' endpoints are all marked affected);
    *  4. every other cluster keeps its stored label untouched.
    *
    * The driver gate is the equality proof: Spark answers incrementally
    * from staged prev artifacts while the oracle recomputes the full
    * chain (all vectors, prev centroids) from scratch. The index-content
    * invariant (prev assignment ∪ delta assignment ≡ full assignment)
    * is pinned separately by IncrementalIvfSpec. */
  def embeddingDedupIncremental(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, threshold: Double = 0.4,
      nProbe: Int = 4): DataFrame = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val delta = all.filter(col("vec_id") % 6 === 0)
    val art = stagedIvfPrev(spark, dir, resolveK(spark, dir, nCentroids),
      nProbe, threshold)
    val deltaAssigned = assignWithCentroids(spark, delta,
      art.centroids, nProbe).localCheckpoint()
    val unionAssigned = art.assigned
      .select("vec_id", "cid", "embedding").unionByName(deltaAssigned)
    val newPairs = deltaPairs(deltaAssigned, unionAssigned, threshold)
      .localCheckpoint() // feeds the touched set AND the edge union

    val deltaIds = delta.select("vec_id")
    val touched = deltaIds
      .unionByName(newPairs.select(col("ida").as("vec_id")))
      .unionByName(newPairs.select(col("idb").as("vec_id")))
      .distinct()
    val affComps = art.comp.join(touched, "vec_id")
      .select("component").distinct()
    val affIds = art.comp.join(affComps, "component").select("vec_id")
      .unionByName(deltaIds).distinct()
      .localCheckpoint() // two consumers: subgraph filter + assignment
    val pairsV2 = art.pairs.unionByName(newPairs).distinct()
    val subEdges = pairsV2
      .join(affIds.withColumnRenamed("vec_id", "ida"), Seq("ida"), "left_semi")
    // Edge-closure guard (same invariant as IncrementalCuration): an
    // edge with exactly one affected endpoint would be silently dropped
    // by the ida-only semi-join — fail loudly if a pair source ever
    // breaks the closure.
    val stray = subEdges
      .join(affIds.withColumnRenamed("vec_id", "idb"), Seq("idb"), "left_anti")
    if (!stray.isEmpty)
      throw new IllegalStateException(
        "incremental IVF dedup: affected subgraph is not edge-closed " +
          "(an edge has exactly one affected endpoint)")
    // the affected subgraph is delta-sized by construction —
    // componentsAuto closes it driver-side below its edge bound
    // (identical min-label semantics), distributed above it
    val subComp = Graphs.componentsAuto(subEdges, "ida", "idb")
      .withColumnRenamed("id", "vec_id")

    val unaffected = art.comp.join(affIds, Seq("vec_id"), "left_anti")
    val affAssign = affIds.join(subComp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("component"))
    unaffected.unionByName(affAssign)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .withColumn("status",
        when(col("vec_id") % 6 === 0, "appended").otherwise("indexed"))
      .orderBy("vec_id")
  }

  /** Stored artifacts of the prev index build (the production tables). */
  case class IvfPrevArtifacts(centroids: Array[(Long, Array[Float])],
      assigned: DataFrame, pairs: DataFrame, comp: DataFrame)

  /** Stage the prev corpus's index artifacts once per (fixture
    * signature, process) via the shared staged-dir protocol: the
    * assignment, its candidate pairs, and the full component labels —
    * what the prior nightly build would have persisted. Centroids
    * re-derive deterministically from the prev corpus (same first-K
    * contract the stage write used). */
  def stagedIvfPrev(spark: SparkSession, dir: String, nCentroids: Int,
      nProbe: Int, threshold: Double): IvfPrevArtifacts = {
    val prev = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 6 =!= 0)
    val cents = centroidsOf(prev, nCentroids)
    val root = graft.streaming.FixtureStaging
      .stageOnce(s"ivfprev:$nCentroids:$nProbe:$threshold",
        s"$dir/embeddings.parquet", "/tmp/graft-ivfprev") { d =>
        val assigned = assignWithCentroids(spark, prev, cents, nProbe)
        assigned.write.mode("overwrite").parquet(s"$d/assigned")
        // uncapped, matching deltaPairs and the full-rebuild oracle:
        // capped stored pairs + an uncapped delta probe would diverge
        // on a skewed corpus (the cap's sub-split keys on bucket size)
        val pairs = pairsFromAssigned(
          spark.read.parquet(s"$d/assigned"), threshold, nProbe,
          maxBucket = Long.MaxValue)
        pairs.write.mode("overwrite").parquet(s"$d/pairs")
        prev.select("vec_id")
          .join(Graphs.components(spark.read.parquet(s"$d/pairs"),
            "ida", "idb").withColumnRenamed("id", "vec_id"),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("comp"), col("vec_id")).as("component"))
          .write.mode("overwrite").parquet(s"$d/comp")
      }
    IvfPrevArtifacts(cents,
      assigned = spark.read.parquet(s"$root/assigned"),
      pairs = spark.read.parquet(s"$root/pairs"),
      comp = spark.read.parquet(s"$root/comp"))
  }

  /** q233 — ONE maintenance epoch carrying BOTH CDC verbs: appends
    * (q158's delta) and tombstone deletes (q231's retraction feed)
    * land together, the way a real change-feed batch arrives. The two
    * key sets are disjoint by construction (appends are vec_id ≡ 0
    * mod 6; tombstones are prev-corpus keys ≡ 3 mod 7), honoring the
    * DeltaLog contract that one epoch never upserts and deletes the
    * same key.
    *
    * Composition rules, each load-bearing for exactness:
    *   - the delta probes the SURVIVING index ∪ itself — a new vector
    *     must never link THROUGH a retracted one (the tombstone is
    *     gone before the epoch's pairs exist);
    *   - a cluster is affected if a tombstone retires one of its
    *     members OR a new edge touches it; appends are affected by
    *     definition. Affected clusters re-close on surviving stored
    *     edges ∪ new edges; everyone else keeps stored labels;
    *   - assignment stays frozen to the prev centroids for both verbs
    *     (centroid refresh is a re-train — q155's story).
    *
    * The driver gate proves the whole epoch: the oracle recomputes the
    * full chain over the POST-EPOCH corpus (prev ∖ tombs ∪ appends)
    * against the frozen prev centroids. */
  def embeddingDedupUpsertDelete(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, threshold: Double = 0.4,
      nProbe: Int = 4): DataFrame = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val appends = all.filter(col("vec_id") % 6 === 0)
    val art = stagedIvfPrev(spark, dir, resolveK(spark, dir, nCentroids),
      nProbe, threshold)
    val tomb = graft.sources.DeltaLog.stagedTombstones(spark, "ivfud",
        s"$dir/embeddings.parquet",
        all.filter(col("vec_id") % 6 =!= 0).select(col("vec_id")),
        col("vec_id") % 7 === 3, "vec_id")
      .localCheckpoint() // affected set + three anti-joins
    val d = ivfEpochStep(spark, art.centroids,
      art.assigned.select("vec_id", "cid", "embedding"),
      art.pairs, art.comp, appends, tomb, threshold, nProbe)
    d.unaffected.unionByName(d.reclosed)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .withColumn("status",
        when(col("vec_id") % 6 === 0, "appended").otherwise("retained"))
      .orderBy("vec_id")
  }

  /** One maintenance epoch's keyed DELTAS against the index state —
    * what the epoch COMMITS (to [[graft.sources.DeltaLog]] tables in
    * the streaming maintainer) or assembles into the post-epoch verdict
    * (q233). Upsert/retire frames per state table; `unaffected` is the
    * complement read (stored labels the epoch never touched). */
  private[graft] case class IvfEpochDeltas(
      deltaAssigned: DataFrame, retiredAssigned: DataFrame,
      newPairs: DataFrame, retiredPairs: DataFrame,
      reclosed: DataFrame, unaffected: DataFrame)

  /** The CDC epoch-step core shared by q233 (one staged epoch) and the
    * q235 streaming maintainer (a drained sequence of them): apply one
    * batch of upserts + tombstones to the stored (assigned, pairs,
    * comp) index state against frozen `centroids`. The composition
    * rules documented on [[embeddingDedupUpsertDelete]] live HERE —
    * delta probes the surviving index ∪ itself, affected = tombstoned
    * ∪ edge-touched ∪ appended, re-closure on surviving ∪ new edges.
    * `tomb` must already be checkpointed by the caller (it fans into
    * the affected set and three anti-joins). */
  private[graft] def ivfEpochStep(spark: SparkSession,
      centroids: Array[(Long, Array[Float])], assigned: DataFrame,
      pairs: DataFrame, comp: DataFrame, ups: DataFrame, tomb: DataFrame,
      threshold: Double, nProbe: Int): IvfEpochDeltas = {
    val deltaAssigned = assignWithCentroids(spark, ups,
      centroids, nProbe).localCheckpoint()
    val survAssigned = assigned.join(tomb, Seq("vec_id"), "left_anti")
    val newPairs = deltaPairs(deltaAssigned,
        survAssigned.unionByName(deltaAssigned), threshold)
      .localCheckpoint() // touched set AND the edge union

    val upIds = ups.select("vec_id")
    val touched = upIds
      .unionByName(newPairs.select(col("ida").as("vec_id")))
      .unionByName(newPairs.select(col("idb").as("vec_id")))
      .unionByName(tomb)
      .distinct()
    val affComps = comp.join(touched, "vec_id")
      .select("component").distinct()
    val affIds = comp.join(affComps, "component").select("vec_id")
      .join(tomb, Seq("vec_id"), "left_anti")
      .unionByName(upIds).distinct()
      .localCheckpoint() // subgraph filter + closure guard + labels
    val survStored = pairs
      .join(tomb.withColumnRenamed("vec_id", "ida"), Seq("ida"), "left_anti")
      .join(tomb.withColumnRenamed("vec_id", "idb"), Seq("idb"), "left_anti")
    val pairsV2 = survStored.unionByName(newPairs).distinct()
    val subEdges = pairsV2
      .join(affIds.withColumnRenamed("vec_id", "ida"), Seq("ida"), "left_semi")
      .localCheckpoint() // stray guard + closure read one materialization
    val stray = subEdges
      .join(affIds.withColumnRenamed("vec_id", "idb"), Seq("idb"), "left_anti")
    if (!stray.isEmpty)
      throw new IllegalStateException(
        "upsert+delete maintenance: affected subgraph is not edge-closed")
    // the affected subgraph is delta-sized by construction —
    // componentsAuto closes it driver-side below its edge bound
    // (identical min-label semantics), distributed above it
    val subComp = Graphs.componentsAuto(subEdges, "ida", "idb")
      .withColumnRenamed("id", "vec_id")
    val unaffected = comp
      .join(affComps, Seq("component"), "left_anti")
      .select("vec_id", "component")
    val reclosed = affIds.join(subComp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("component"))
    val retiredAssigned = assigned
      .join(tomb, Seq("vec_id"), "left_semi").select("vec_id", "cid")
    val retiredPairs = pairs
      .join(tomb.withColumnRenamed("vec_id", "ida"), Seq("ida"), "left_semi")
      .unionByName(pairs
        .join(tomb.withColumnRenamed("vec_id", "idb"), Seq("idb"), "left_semi"))
      .select("ida", "idb").distinct()
    IvfEpochDeltas(deltaAssigned, retiredAssigned,
      newPairs, retiredPairs, reclosed, unaffected)
  }

  /** Stored artifacts of the FULL-corpus index build — the starting
    * state of tombstone-delete maintenance (q231): the same
    * (assigned, pairs, comp) triple as [[stagedIvfPrev]] but over every
    * vector, centroids frozen at the full corpus's first-K. Pairs are
    * stored UNCAPPED for the same reason stagedIvfPrev's are. */
  def stagedIvfFull(spark: SparkSession, dir: String, nCentroids: Int,
      nProbe: Int, threshold: Double): IvfPrevArtifacts = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = centroidsOf(all, nCentroids)
    val root = graft.streaming.FixtureStaging
      .stageOnce(s"ivffull:$nCentroids:$nProbe:$threshold",
        s"$dir/embeddings.parquet", "/tmp/graft-ivffull") { d =>
        assignWithCentroids(spark, all, cents, nProbe)
          .write.mode("overwrite").parquet(s"$d/assigned")
        pairsFromAssigned(spark.read.parquet(s"$d/assigned"), threshold,
            nProbe, maxBucket = Long.MaxValue)
          .write.mode("overwrite").parquet(s"$d/pairs")
        all.select("vec_id")
          .join(Graphs.components(spark.read.parquet(s"$d/pairs"),
            "ida", "idb").withColumnRenamed("id", "vec_id"),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("comp"), col("vec_id")).as("component"))
          .write.mode("overwrite").parquet(s"$d/comp")
      }
    IvfPrevArtifacts(cents,
      assigned = spark.read.parquet(s"$root/assigned"),
      pairs = spark.read.parquet(s"$root/pairs"),
      comp = spark.read.parquet(s"$root/comp"))
  }

  /** q231 — incremental embedding dedup after DELETES: the retraction
    * half of the index-maintenance story (q158 covers appends). A
    * tombstone batch arrives through the keyed [[graft.sources.DeltaLog]]
    * change feed (the same log q162's continuous curation commits to —
    * a GDPR takedown or re-crawl retraction is a DELTA operation, not a
    * rebuild) and the stored dedup state updates in delta-sized work:
    *
    *  1. tombstones: CDC `delete` rows from the staged retraction log
    *     ([[graft.sources.DeltaLog.stagedTombstones]]);
    *  2. a stored cluster is AFFECTED iff it contains a tombstoned
    *     vector; every other cluster keeps its stored label untouched
    *     (deletes can only remove edges, never create them — the dual
    *     of q158's additions-never-retire-edges invariant);
    *  3. affected clusters re-close on their SURVIVING edges only —
    *     a deleted bridge vector splits its cluster, and a deleted
    *     canonical (min-id) promotes the smallest survivor, both
    *     falling out of the min-label closure with no special cases;
    *  4. assignment rows and stored pairs retire by keyed anti-join —
    *     at deployment scale a bucketed delete in the index table,
    *     never a corpus rewrite.
    *
    * Exactness: assignment is per-vector against FROZEN centroids
    * (frozen even when a centroid vector is itself deleted — the q158
    * contract: centroid refresh is a re-train, q155's story), so the
    * survivor corpus's pair set is exactly the stored pairs with both
    * endpoints surviving, and stored components are edge-closed, so no
    * surviving edge crosses an affected/unaffected boundary. The driver
    * gate proves it: the oracle recomputes the FULL chain (assignment,
    * pairs, closure) over the post-delete corpus from scratch. */
  def embeddingDedupWithDeletes(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, threshold: Double = 0.4,
      nProbe: Int = 4): DataFrame = {
    val art = stagedIvfFull(spark, dir, resolveK(spark, dir, nCentroids),
      nProbe, threshold)
    val tomb = graft.sources.DeltaLog.stagedTombstones(spark, "ivfdel",
        s"$dir/embeddings.parquet",
        Tables.embeddings(spark, dir).select(col("vec_id")),
        col("vec_id") % 7 === 3, "vec_id")
      .localCheckpoint() // feeds the affected set + three anti-joins
    deletesApplied(art, tomb)
  }

  /** The delete-maintenance core over stored artifacts + a tombstone
    * frame — factored out so IncrementalIvfSpec can drive it with
    * hand-built states (canonical deletion, bridge split). */
  private[graft] def deletesApplied(art: IvfPrevArtifacts,
      tomb: DataFrame): DataFrame = {
    val affComps = broadcast(art.comp.join(tomb, "vec_id")
      .select("component").distinct())
    val affSurvivors = art.comp.join(affComps, "component")
      .join(tomb, Seq("vec_id"), "left_anti").select("vec_id")
      .localCheckpoint() // subgraph filter + closure guard + label join
    val subEdges = art.pairs
      .join(tomb.withColumnRenamed("vec_id", "ida"), Seq("ida"), "left_anti")
      .join(tomb.withColumnRenamed("vec_id", "idb"), Seq("idb"), "left_anti")
      .join(affSurvivors.withColumnRenamed("vec_id", "ida"),
        Seq("ida"), "left_semi")
    // Edge-closure guard (the q158 discipline): stored components are
    // edge-closed, so a surviving edge out of an affected component
    // cannot exist — fail loudly if a pair source ever breaks that.
    val stray = subEdges
      .join(affSurvivors.withColumnRenamed("vec_id", "idb"),
        Seq("idb"), "left_anti")
    if (!stray.isEmpty)
      throw new IllegalStateException(
        "delete maintenance: affected subgraph is not edge-closed " +
          "(a surviving edge leaves an affected component)")
    // delta-sized affected subgraph — same componentsAuto rationale as
    // ivfEpochStep (identical closure, driver-closed below the bound)
    val subComp = Graphs.componentsAuto(subEdges, "ida", "idb")
      .withColumnRenamed("id", "vec_id")
    val unaffected = art.comp
      .join(affComps, Seq("component"), "left_anti")
      .select("vec_id", "component")
    val reclosed = affSurvivors.join(subComp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("component"))
    unaffected.unionByName(reclosed)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .orderBy("vec_id")
  }

  /** q141's candidate generator, exposed for precision/recall testing:
    * pairs sharing an IVF bucket whose cosine clears `threshold`. Every
    * emitted pair is a TRUE above-threshold pair (the bucketing can
    * only lose candidates, never invent them — VectorDedupSpec pins
    * that); `(ida, idb)` with `ida < idb`.
    *
    * `nProbe` > 1 assigns each vector to its nProbe nearest centroids
    * (the standard IVF multi-probe recall lever): the candidate set is
    * a SUPERSET of the single-probe set — a pair sharing its best
    * bucket still shares it — so recall is monotone in nProbe at the
    * cost of nProbe× assignment rows. VectorDedupSpec measures the
    * recall curve against the exact pair set. */
  def ivfCandidatePairs(spark: SparkSession, embeddings: DataFrame,
      nCentroids: Int, threshold: Double, nProbe: Int = 1,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    pairsFromAssigned(
      ivfAssign(spark, embeddings, nCentroids, nProbe),
      threshold, nProbe, maxBucket)

  /** Multi-probe nearest-centroid assignment — the IVF index CONTENT:
    * one map-only pass, each vector assigned to its `nProbe` nearest of
    * the first-`nCentroids` corpus vectors (ties → lower cid, matching
    * the single-probe argmax's first-max-wins scan). Centroids are a
    * metadata-sized driver constant (nCentroids × dim floats), exactly
    * like [[ivfKnn]]'s. Persisted cid-bucketed by
    * [[graft.sources.IvfIndex]]. */
  def ivfAssign(spark: SparkSession, embeddings: DataFrame,
      nCentroids: Int, nProbe: Int): DataFrame =
    assignWithCentroids(spark, embeddings,
      centroidsOf(embeddings, nCentroids), nProbe)

  /** The deterministic first-K centroid sample of a corpus frame — a
    * driver-side constant (nCentroids × dim floats, metadata-sized). */
  def centroidsOf(embeddings: DataFrame,
      nCentroids: Int): Array[(Long, Array[Float])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < nCentroids)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  /** Multi-probe assignment against EXPLICIT centroids — the index's
    * own, frozen at creation: incremental maintenance (q158) assigns
    * DELTA vectors against them without re-deriving, which is what keeps
    * an appended index consistent with its existing buckets. */
  def assignWithCentroids(spark: SparkSession, embeddings: DataFrame,
      cents: Array[(Long, Array[Float])], nProbe: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val np = nProbe
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          cs.map { case (cid, cv) => (cid, cosOf(v, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(np)
            .map { case (cid, _) => (id, cid, v) }
        }
      }.toDF("vec_id", "cid", "embedding")
  }

  /** Bucket-size cap for candidate generation — the skew guard SCALE.md
    * names: an adversarial corpus (all-near-identical vectors) collapses
    * every row into one bucket and Σ bucket² degenerates to N². The
    * guard sub-splits any bucket larger than `cap` into
    * `nsub = ⌈n/cap⌉` deterministic sub-buckets and only pairs WITHIN a
    * sub-bucket, bounding per-bucket pair work to ~n·cap expected
    * (linear in n at fixed cap) instead of n².
    *
    * The sub-bucket of a row is `hash64(id) % nsub` — a pure function
    * of the ROW once `nsub` is fixed, which is what lets the cap
    * compose with incrementality: freeze the census (the bucket→nsub
    * map) at index-build time like the centroids ([[bucketCensus]] +
    * the `census` overload of [[pairsFromAssigned]]/[[deltaPairs]]),
    * and stored pairs, delta probes, and a full recompute against the
    * same frozen census all agree row-for-row (IvfSkewGuardSpec proves
    * incremental ≡ full with the cap ACTIVE on the planted corpus).
    * The hash (not `id % nsub`) keeps the split even under structured
    * id patterns — a delta of all-even ids would collapse residue
    * classes. A bucket that grows past nsub·cap after the freeze
    * degrades toward quadratic until a census refresh — the same drift
    * contract as frozen centroids, refreshed by the same re-train.
    *
    * Degrade policy, documented: pairs STRADDLING sub-buckets are the
    * recall loss — an oversized bucket's cluster may split into up to
    * nsub clusters (each sub-bucket still closes internally). The
    * split is deterministic (seeded hash, no RNG), so reruns and the
    * oracle replay it exactly; IvfSkewGuardSpec plants the pathological
    * corpus and pins both the pair bound and the stable verdict. When
    * no bucket exceeds `cap` — every real gate SF — nsub = 1, `_sub` is
    * 0 everywhere, and output is bit-identical to the uncapped join.
    *
    * The bucket census is a map-side-combined count at bucket grain,
    * kept only where the cap binds (rows = #oversized buckets, ≈ 0 in
    * practice); it joins back BROADCAST for IVF (≤ nCentroids rows by
    * construction). */
  private[graft] def withBucketCap(assigned: DataFrame, keys: Seq[String],
      idCol: String, cap: Long, broadcastCensus: Boolean): DataFrame =
    withFrozenBucketCap(assigned, keys, idCol,
      bucketCensus(assigned, keys, cap), broadcastCensus)

  /** The bucket→nsub map of an assignment at `cap` — only buckets where
    * the cap binds (nsub > 1). Computed live by [[withBucketCap]];
    * FROZEN (computed once at index build, reused by every later pass)
    * when the cap must compose with incremental maintenance. */
  private[graft] def bucketCensus(assigned: DataFrame, keys: Seq[String],
      cap: Long): DataFrame =
    assigned.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_bn"))
      .withColumn("_nsub",
        ceil(col("_bn").cast("double") / lit(cap.toDouble)).cast("long"))
      .filter(col("_nsub") > 1L)
      .drop("_bn")

  /** Sub-split `assigned` against an explicit census: `_sub` =
    * `hash64(id) % nsub` (0 for buckets absent from the census — where
    * the cap didn't bind at census time, including buckets born after
    * the freeze). A pure per-row function given the census, so any two
    * passes sharing a census agree on every row's sub-bucket. */
  private[graft] def withFrozenBucketCap(assigned: DataFrame,
      keys: Seq[String], idCol: String, census: DataFrame,
      broadcastCensus: Boolean): DataFrame = {
    val c = if (broadcastCensus) broadcast(census) else census
    assigned.join(c, keys, "left")
      .withColumn("_sub",
        pmod(xxhash64(col(idCol)), coalesce(col("_nsub"), lit(1L))))
      .drop("_nsub")
  }

  /** Default bucket cap: far above any bucket the synthetic SFs
    * produce (the guard is inert on the gates — nsub = 1 everywhere)
    * while still bounding a pathological corpus; a deployment tunes it
    * to executor-memory × recall budget (SCALE.md). */
  val DefaultMaxBucket: Long = 1000000L

  /** Σ bucket² pair scoring over an assignment (from [[ivfAssign]] live
    * or read back from the persisted [[graft.sources.IvfIndex]]): pairs
    * sharing a (bucket, sub-bucket), scored with the codegen'd
    * CosineSim expression — a typed mapPartitions here pays a 2M-row
    * encoder round-trip (measured ~5.0 s → ~3.9 s end-to-end at
    * sf0.1/nProbe=4); arithmetic is pinned bit-identical to cosOf, so
    * the gate hash is unchanged. */
  def pairsFromAssigned(assigned: DataFrame, threshold: Double,
      nProbe: Int, maxBucket: Long = DefaultMaxBucket,
      frozenCensus: Option[DataFrame] = None): DataFrame = {
    val slim = assigned.select(col("vec_id"), col("cid"), col("embedding"))
    val capped = frozenCensus match {
      case Some(c) => withFrozenBucketCap(slim, Seq("cid"), "vec_id", c,
        broadcastCensus = true)
      case None => withBucketCap(slim, Seq("cid"), "vec_id", maxBucket,
        broadcastCensus = true)
    }
    val a = capped.select(col("cid"), col("_sub"),
      col("vec_id").as("ida"), col("embedding").as("va"))
    val b = capped.select(col("cid"), col("_sub"),
      col("vec_id").as("idb"), col("embedding").as("vb"))
    val scored = a.join(b, Seq("cid", "_sub"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        graft.functions.CosineSim.cosineSim(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("ida", "idb")
    // multi-probe can surface one pair from several shared buckets;
    // only true above-threshold pairs reach the distinct (tiny)
    if (nProbe > 1) scored.distinct() else scored
  }

  /** Recall of the IVF-bucketed candidate generator against the exact
    * above-threshold pair set — the dedup twin of [[ivfRecallAtK]].
    * EXACT SIDE IS QUADRATIC: a test/measurement harness for small SFs,
    * not a production operator (production recall is estimated on a
    * sampled slice the same way). */
  def ivfDedupPairRecall(spark: SparkSession, dir: String,
      nCentroids: Int = 16, threshold: Double = 0.4,
      nProbe: Int = 1): Double = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cand = ivfCandidatePairs(spark, e, nCentroids, threshold, nProbe)
      .as[(Long, Long)].collect().toSet
    val vecs = e.as[(Long, Array[Float])].collect()
    val exact = (for {
      (ia, va) <- vecs.iterator
      (ib, vb) <- vecs.iterator
      if ia < ib && cosOf(va, vb) >= threshold
    } yield (ia, ib)).toSet
    if (exact.isEmpty) 1.0
    else (exact intersect cand).size.toDouble / exact.size
  }

  /** IVF (inverted-file) approximate nearest neighbor — the third
    * similarity tier between brute force ([[knnCosine]]) and LSH
    * ([[lshNearDups]]), and the standard billion-vector scale shape:
    *
    *  1. choose K coarse centroids (here: a deterministic sample — the
    *     first K corpus vectors; a production run uses k-means output,
    *     which is likewise a driver-side constant at query time);
    *  2. assign every vector to its nearest centroid — ONE map-side
    *     pass with the K×dim centroid table in the task closure, argmax
    *     inline, no shuffle and no per-vector window;
    *  3. per query, probe only the nProbe nearest centroids' buckets —
    *     an equi-join on centroid id against the (tiny, broadcast)
    *     probe list, so the scan touches ~nProbe/K of the corpus.
    *
    * At 100 TB the assignment is written once as a cid-bucketed table
    * and queries read only their probed buckets (partition pruning on
    * cid); recall/cost tunes with nProbe exactly like FAISS IVF.
    * Everything is deterministic (cosine kernel + fixed tiebreaks), so
    * the DuckDB oracle reproduces the result bit-for-bit, recall loss
    * included. */
  def ivfKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    ivfKnnOn(spark, Tables.embeddings(spark, dir), nQueries, k,
      nCentroids, nProbe)

  def ivfKnnOn(spark: SparkSession, embeddings: DataFrame,
      nQueries: Int, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val cents: Array[(Long, Array[Float])] =
      e.filter(col("vec_id") < nCentroids)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)

    // (2) nearest-centroid assignment, argmax inline (ties → lowest cid)
    val assigned = e.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var bestC = -1L
          var best = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val s = cosOf(v, cs(i)._2)
            if (s > best) { best = s; bestC = cs(i)._1 }
            i += 1
          }
          (id, bestC, v)
        }
      }.toDF("vec_id", "cid", "embedding")

    // (3) probe list: each query's nProbe nearest centroids
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("pcos"), asc("cid"))
    val probes = e.filter(col("vec_id") < nQueries)
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        bc.value.map { case (cid, cv) => (qid, cid, cosOf(qv, cv), qv) }
      }
      .toDF("query_id", "cid", "pcos", "qv")
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select("query_id", "cid", "qv")

    // candidates: only vectors in probed buckets (each vector lives in
    // exactly one bucket, so no dedup needed)
    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes)
      .join(assigned, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) => (qi, ni, cosOf(qv, cv)) })
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** q170: bucketed kNN JOIN — every row of the table is a query, and
    * gets its k nearest neighbors attached via the IVF buckets. This is
    * the table-to-table shape behind "enrich every document with its
    * semantic neighbors" (hard-negative mining, related-items, cluster
    * refinement): no driver-side probe list exists or could — each
    * vector computes its own nProbe probe cids scan-locally against the
    * broadcast centroids, explodes to (query, cid) rows, and the
    * candidate set is ONE equi-join on cid against the single-probe
    * assignment. Work is Σ_q (probed-bucket sizes) ≈ n·nProbe/K of the
    * quadratic all-pairs, and the only shuffle is the cid join + the
    * per-query top-k window. The oracle replays the identical probe
    * arithmetic, so approximation and exactness coincide row-for-row.
    */
  def knnJoin(spark: SparkSession, dir: String,
      k: Int = 3, nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents: Array[(Long, Array[Float])] =
      e.filter(col("vec_id") < nCentroids)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)

    // corpus side: single-probe assignment (one bucket per vector)
    val assigned = e.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var bestC = -1L; var best = Double.NegativeInfinity; var i = 0
          while (i < cs.length) {
            val s = cosOf(v, cs(i)._2)
            if (s > best) { best = s; bestC = cs(i)._1 }
            i += 1
          }
          (id, bestC, v)
        }
      }.toDF("vec_id", "cid", "embedding")

    // query side: EVERY vector emits its nProbe nearest centroids,
    // computed scan-locally (ties → lowest cid, matching the oracle's
    // (pcos DESC, cid ASC) ranking)
    val probes = e.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (qid, qv) =>
          cs.map { case (cid, cv) => (cid, cosOf(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nProbe)
            .map { case (cid, _) => (qid, cid, qv) }
        }
      }.toDF("query_id", "cid", "qv")

    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    probes
      .join(assigned, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) => (qi, ni, cosOf(qv, cv)) })
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** MaxSim kernel for [[maxSimKnn]]: treat a flat d-dim vector as
    * `nSub` contiguous sub-vectors; score = Σ_i max_j cos(q_i, d_j),
    * each per-sub max floor-scaled to BIGINT nano-units BEFORE the sum
    * so the total is exact integer addition (deterministic in any
    * engine/order). Per-element accumulation runs ascending — the same
    * left fold the oracle's `list_reduce` states. */
  def maxSimOf(q: Array[Float], d: Array[Float], nSub: Int): Long = {
    val dim = q.length / nSub
    var total = 0L
    var i = 0
    while (i < nSub) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nSub) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var t = 0
        while (t < dim) {
          val a = q(i * dim + t).toDouble
          val b = d(j * dim + t).toDouble
          dot += a * b; na += a * a; nb += b * b
          t += 1
        }
        val c = dot / (math.sqrt(na) * math.sqrt(nb))
        if (c > best) best = c
        j += 1
      }
      total += math.floor(best * 1e9 + 0.5).toLong
      i += 1
    }
    total
  }

  /** q171: late-interaction multi-vector retrieval (the ColBERT MaxSim
    * contract): documents and queries are bags of sub-vectors, and the
    * score sums, over the query's sub-vectors, the best-matching doc
    * sub-vector — token-level matching that single-vector cosine
    * flattens away. The fixture's 64-dim embeddings stand in as 4×16
    * multi-vectors (contiguous slices), which exercises the real
    * dataflow: per-pair all-sub-pairs scoring in one scan-local kernel,
    * broadcast query bag, per-query top-k window. At 100 TB the doc
    * sub-vectors are the stored representation and candidate
    * generation goes through the IVF buckets first ([[knnJoin]]);
    * the MaxSim re-scorer here is the second stage unchanged. */
  def maxSimKnn(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 5, nSub: Int = 4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) =>
        (qi, ni, maxSimOf(qv, cv, nSub))
      })
      .toDF("query_id", "neighbor_id", "maxsim9")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("maxsim9"), asc("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        (col("maxsim9").cast("double") / 1e9).as("maxsim"))
      .orderBy("query_id", "rank")
  }

  /** q175: product quantization + asymmetric-distance serve (the FAISS
    * PQ contract, Jégou et al.): the vector splits into `m` subspaces,
    * each with its own tiny Lloyd-trained codebook; a vector compresses
    * to `m` small codes (here 4×2 bits — 64 floats → half a byte of
    * code), and serving never reconstructs: the query precomputes a
    * distance TABLE per subspace (kSub entries each) and a candidate's
    * approximate distance is m table lookups summed — the scan reads
    * codes, not vectors.
    *
    * Trained on the q76 Lloyd discipline (fixed first-k init, fixed
    * rounds, floor-scaled integer centroid sums) so the codebooks are
    * deterministic and the DuckDB oracle replays the training per
    * subspace. Distance-table entries floor-scale to BIGINT nano-units
    * before the per-candidate sum — exact integer ranking. At 100 TB
    * the codes table is the stored artifact (512× smaller than the
    * floats); training runs on a sample; the serve scan is m BIGINT
    * lookups per row, no float I/O at all.
    */
  def pqKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      m: Int = 4, kSub: Int = 4, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val dim = ds.head()._2.length
    val sub = dim / m
    // per-subspace codebooks, trained independently (sorted by cid so
    // argmin iteration order matches the oracle's (d ASC, cid ASC))
    val books: Array[Array[(Long, Array[Double])]] =
      (0 until m).map { s =>
        lloydRounds(spark,
          ds.map { case (id, v) => (id, v.slice(s * sub, (s + 1) * sub)) },
          kSub, iters)
      }.toArray
    val bc = spark.sparkContext.broadcast(books)

    // codes: per vector, the argmin centroid per subspace — the stored
    // representation (m longs standing in for m packed bit-codes)
    val codes = ds.mapPartitions { it =>
      val bs = bc.value
      it.map { case (id, v) =>
        val cs = new Array[Long](bs.length)
        var s = 0
        while (s < bs.length) {
          val slice = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
          var bestC = Long.MaxValue; var best = Double.PositiveInfinity
          var i = 0
          while (i < bs(s).length) {
            val d = distSq(slice, bs(s)(i)._2)
            if (d < best) { best = d; bestC = bs(s)(i)._1 }
            i += 1
          }
          cs(s) = bestC
          s += 1
        }
        (id, cs)
      }
    }.toDF("vec_id", "codes")

    // queries: per-subspace distance tables, nano-unit scaled
    val queries = ds.filter(_._1 < nQueries).mapPartitions { it =>
      val bs = bc.value
      it.map { case (id, v) =>
        val dt = bs.zipWithIndex.map { case (book, s) =>
          val slice = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
          book.map { case (cid, c) =>
            (cid, math.floor(distSq(slice, c) * 1e9 + 0.5).toLong)
          }.toMap
        }
        (id, dt)
      }
    }.toDF("query_id", "dtables")

    val w = Window.partitionBy("query_id")
      .orderBy(asc("adist9"), asc("neighbor_id"))
    broadcast(queries)
      .join(codes, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dtables"), col("codes"))
      .as[(Long, Long, Array[Map[Long, Long]], Array[Long])]
      .mapPartitions(_.map { case (qi, ni, dts, cs) =>
        var s = 0; var a = 0L
        while (s < cs.length) { a += dts(s)(cs(s)); s += 1 }
        (qi, ni, a)
      })
      .toDF("query_id", "neighbor_id", "adist9")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        (col("adist9").cast("double") / 1e9).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** q177 — IVFADC, the textbook composition (Jégou et al.) of the two
    * gated halves: the IVF coarse quantizer (q50's probe discipline)
    * restricts candidates to the query's nProbe buckets, and the PQ
    * ADC sum (q175's codes + distance tables) scores only those — the
    * serve path reads ~nProbe/K of the CODES table and touches no
    * floats at all. This variant encodes raw vectors (not residuals):
    * residual codebooks would need double-precision training vectors,
    * which breaks the float-slice parity the oracle replays — the
    * dataflow (probe → bucket-restrict → table-lookup score) is
    * identical either way.
    */
  def ivfAdcKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 4, kSub: Int = 4, iters: Int = 2): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(asc("adist9"), asc("neighbor_id"))
    adcCandidates(spark, dir, nQueries, nCentroids, nProbe, m, kSub, iters)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        (col("adist9").cast("double") / 1e9).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** The IVFADC candidate scores (query_id, neighbor_id, adist9) — the
    * probe → bucket-restrict → distance-table-lookup pipeline shared
    * by [[ivfAdcKnn]] (ranks the approximate scores directly) and
    * [[ivfAdcRerank]] (shortlists on them, then refines exactly). */
  private[operators] def adcCandidates(spark: SparkSession, dir: String,
      nQueries: Int, nCentroids: Int, nProbe: Int,
      m: Int, kSub: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val ds = e.as[(Long, Array[Float])]
    val dim = ds.head()._2.length
    val sub = dim / m

    // ---- coarse quantizer (q50's arithmetic) ----
    val cents: Array[(Long, Array[Float])] =
      ds.filter(_._1 < nCentroids).collect().sortBy(_._1)
    val bcC = spark.sparkContext.broadcast(cents)
    val assigned = ds.mapPartitions { it =>
      val cs = bcC.value
      it.map { case (id, v) =>
        var bestC = -1L; var best = Double.NegativeInfinity; var i = 0
        while (i < cs.length) {
          val s = cosOf(v, cs(i)._2)
          if (s > best) { best = s; bestC = cs(i)._1 }
          i += 1
        }
        (id, bestC)
      }
    }.toDF("vec_id", "cid")
    val probes = ds.filter(_._1 < nQueries).mapPartitions { it =>
      val cs = bcC.value
      it.flatMap { case (qid, qv) =>
        cs.map { case (cid, cv) => (cid, cosOf(qv, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nProbe)
          .map { case (cid, _) => (qid, cid) }
      }
    }.toDF("query_id", "cid")

    // ---- fine quantizer (q175's codebooks, codes, distance tables) ----
    val books: Array[Array[(Long, Array[Double])]] =
      (0 until m).map { s =>
        lloydRounds(spark,
          ds.map { case (id, v) => (id, v.slice(s * sub, (s + 1) * sub)) },
          kSub, iters)
      }.toArray
    val bcB = spark.sparkContext.broadcast(books)
    val codes = ds.mapPartitions { it =>
      val bs = bcB.value
      it.map { case (id, v) =>
        val cs = new Array[Long](bs.length)
        var s = 0
        while (s < bs.length) {
          val slice = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
          var bestC = Long.MaxValue; var best = Double.PositiveInfinity
          var i = 0
          while (i < bs(s).length) {
            val d = distSq(slice, bs(s)(i)._2)
            if (d < best) { best = d; bestC = bs(s)(i)._1 }
            i += 1
          }
          cs(s) = bestC
          s += 1
        }
        (id, cs)
      }
    }.toDF("vec_id", "codes")
    val queryDts = ds.filter(_._1 < nQueries).mapPartitions { it =>
      val bs = bcB.value
      it.map { case (id, v) =>
        val dt = bs.zipWithIndex.map { case (book, s) =>
          val slice = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
          book.map { case (cid, c) =>
            (cid, math.floor(distSq(slice, c) * 1e9 + 0.5).toLong)
          }.toMap
        }
        (id, dt)
      }
    }.toDF("query_id", "dtables")

    // ---- serve: bucket-restrict, then table-lookup score ----
    broadcast(probes)
      .join(assigned, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, "vec_id")
      .join(broadcast(queryDts), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dtables"), col("codes"))
      .as[(Long, Long, Array[Map[Long, Long]], Array[Long])]
      .mapPartitions(_.map { case (qi, ni, dts, cs) =>
        var s = 0; var a = 0L
        while (s < cs.length) { a += dts(s)(cs(s)); s += 1 }
        (qi, ni, a)
      })
      .toDF("query_id", "neighbor_id", "adist9")
  }

  /** q293 — two-stage ANN serve: IVFADC shortlist + EXACT re-rank,
    * the production serving pattern (FAISS's refine / RefineFlat
    * stage): the compressed index (codes, ~dim/8 of the float bytes)
    * produces a `shortN` candidate shortlist per query at full speed,
    * and only those shortN rows fetch their raw vectors for an exact
    * cosine — the final ranking is exact over the shortlist, fixing
    * quantization rank-inversions at a cost of shortN vector reads
    * per query instead of a corpus scan.
    *
    * Scale: stage 1 reads ~nProbe/K of the CODES table (q177's
    * contract); stage 2 is a shortN·|queries|-row equi-join against
    * the vector store — a key-lookup batch, never a scan. The
    * shortlist window is a bounded per-key heap (TopKPerKey's
    * pattern). Ref has no ANN at all; this rounds out the
    * quantization ladder q166→q175→q177 with the read path a real
    * deployment serves from. */
  def ivfAdcRerank(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, shortN: Int = 20,
      nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 4, kSub: Int = 4, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val shortW = Window.partitionBy("query_id")
      .orderBy(asc("adist9"), asc("neighbor_id"))
    val short = adcCandidates(spark, dir, nQueries, nCentroids, nProbe,
        m, kSub, iters)
      .withColumn("rn", row_number().over(shortW))
      .filter(col("rn") <= shortN)
      .select("query_id", "neighbor_id")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    short
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("nv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, nv) =>
        (qi, ni, cosOf(qv, nv)) })
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** RESIDUAL IVFADC — the full FAISS composition (Jégou et al.) that
    * q177 documents as its one divergence: PQ codebooks train on, and
    * codes encode, the RESIDUAL r = v − c(v) of each vector against
    * its coarse centroid, and each query builds a distance table PER
    * PROBED LIST from its own residual r_q = q − c_list. Residual
    * energy is what remains after the coarse quantizer explains its
    * share, so the same (m × kSub) code budget spends on a tighter
    * distribution — the reason the textbook stack is coarse+residual,
    * not coarse+raw.
    *
    * Gated by SPEC, not hash (Round8Spec): residual training runs in
    * double precision per subspace and the oracle cannot replay the
    * float-slice parity q175/q177 rely on — the verdict's asked-for
    * trade. The spec pins: determinism across runs, recall@k vs the
    * exact L2 ground truth at least that of the raw-PQ q177, and mean
    * rank displacement no worse.
    *
    * Scale shape is identical to q177: codebooks/centroids are
    * metadata-sized broadcasts, codes are the stored artifact, the
    * serve path reads ~nProbe/K of the codes table and touches no
    * floats. The residual step adds one subtraction per row at encode
    * time and nProbe table builds per query — nothing new shuffles. */
  def ivfAdcKnnResidual(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 4, kSub: Int = 4, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val dim = ds.head()._2.length
    val sub = dim / m

    // ---- coarse quantizer: q177's arithmetic, plus the residual ----
    val cents: Array[(Long, Array[Float])] =
      ds.filter(_._1 < nCentroids).collect().sortBy(_._1)
    val bcC = spark.sparkContext.broadcast(cents)
    val rdf = ds.mapPartitions { it =>
      val cs = bcC.value
      it.map { case (id, v) =>
        var bestC = -1L; var best = Double.NegativeInfinity
        var bi = -1; var i = 0
        while (i < cs.length) {
          val s = cosOf(v, cs(i)._2)
          if (s > best) { best = s; bestC = cs(i)._1; bi = i }
          i += 1
        }
        val cv = cs(bi)._2
        val r = new Array[Float](v.length)
        var j = 0
        while (j < v.length) { r(j) = v(j) - cv(j); j += 1 }
        (id, bestC, r)
      }
    }.toDF("vec_id", "cid", "resid")
      .localCheckpoint() // feeds codebook training AND encoding
    val rds = rdf.select(col("vec_id"), col("resid"))
      .as[(Long, Array[Float])]

    // ---- fine quantizer over RESIDUAL slices ----
    val books: Array[Array[(Long, Array[Double])]] =
      (0 until m).map { s =>
        lloydRounds(spark,
          rds.map { case (id, r) => (id, r.slice(s * sub, (s + 1) * sub)) },
          kSub, iters)
      }.toArray
    val bcB = spark.sparkContext.broadcast(books)
    val codes = rds.mapPartitions { it =>
      val bs = bcB.value
      it.map { case (id, r) =>
        val cs = new Array[Long](bs.length)
        var s = 0
        while (s < bs.length) {
          val slice = java.util.Arrays.copyOfRange(r, s * sub, (s + 1) * sub)
          var bestC = Long.MaxValue; var best = Double.PositiveInfinity
          var i = 0
          while (i < bs(s).length) {
            val d = distSq(slice, bs(s)(i)._2)
            if (d < best) { best = d; bestC = bs(s)(i)._1 }
            i += 1
          }
          cs(s) = bestC
          s += 1
        }
        (id, cs)
      }
    }.toDF("vec_id", "codes")

    // ---- per-(query, probed list) residual distance tables ----
    val queryDts = ds.filter(_._1 < nQueries).mapPartitions { it =>
      val cs = bcC.value; val bs = bcB.value
      it.flatMap { case (qid, qv) =>
        cs.map { case (cid, cv) => (cid, cosOf(qv, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nProbe)
          .map { case (cid, _) =>
            val cv = cs.find(_._1 == cid).get._2
            val rq = new Array[Float](qv.length)
            var j = 0
            while (j < qv.length) { rq(j) = qv(j) - cv(j); j += 1 }
            val dt = bs.zipWithIndex.map { case (book, s) =>
              val slice =
                java.util.Arrays.copyOfRange(rq, s * sub, (s + 1) * sub)
              book.map { case (bcid, c) =>
                (bcid, math.floor(distSq(slice, c) * 1e9 + 0.5).toLong)
              }.toMap
            }
            (qid, cid, dt)
          }
      }
    }.toDF("query_id", "cid", "dtables")

    // ---- serve: bucket-restrict, residual-table lookup score ----
    val w = Window.partitionBy("query_id")
      .orderBy(asc("adist9"), asc("neighbor_id"))
    broadcast(queryDts)
      .join(rdf.select(col("vec_id"), col("cid")), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dtables"), col("codes"))
      .as[(Long, Long, Array[Map[Long, Long]], Array[Long])]
      .mapPartitions(_.map { case (qi, ni, dts, cs) =>
        var s = 0; var a = 0L
        while (s < cs.length) { a += dts(s)(cs(s)); s += 1 }
        (qi, ni, a)
      })
      .toDF("query_id", "neighbor_id", "adist9")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        (col("adist9").cast("double") / 1e9).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** q179: embedding-space outlier detection per label — the
    * mislabeled-example filter a supervised-data pipeline runs before
    * training: each vector's squared distance to ITS OWN label's
    * centroid, z-scored within the label; members far from their class
    * prototype (z > 2) are flagged for review. Composes the q113
    * centroid arithmetic (floor-scaled integer component sums) with a
    * scan-local distance kernel; the per-label moment sums run over
    * milli-scaled BIGINTs so mean/variance are exact under any
    * partition order.
    *
    * Scale: centroids are label-grain metadata (broadcast); the
    * distance pass is map-only; the z-score needs one label-grain
    * aggregate joined back — nothing row-scale shuffles twice. */
  def labelOutliers(spark: SparkSession, dir: String,
      zCut: Double = 2.0): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
    // label centroids, q113's exact discipline: floor-scaled µ-integer
    // component sums → one IEEE division chain per component
    val cents: Map[Long, Array[Double]] = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(floor(col("x").cast("double") * lit(1000000.0) + lit(0.5))
        .cast("long")).as("s"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getLong(0)).map { case (l, rows) =>
        val c = new Array[Double](rows.length)
        rows.foreach(r => c(r.getInt(1)) =
          r.getLong(2).toDouble / 1000000.0 / r.getLong(3))
        l -> c
      }
    val bc = spark.sparkContext.broadcast(cents)
    val d = e.as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, l, v) => (id, l, distSq(v, cs(l))) }
      }
      .toDF("vec_id", "label", "d2")
      .withColumn("d3", floor(col("d2") * lit(1000.0) + lit(0.5)).cast("long"))
    val stats = d.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("d3").as("s1"),
        sum(col("d3") * col("d3")).as("s2"))
    val mean = col("s1").cast("double") / 1000.0 / col("n")
    val variance =
      col("s2").cast("double") / 1000000.0 / col("n") - mean * mean
    val z = when(variance <= 0.0, lit(0.0))
      .otherwise((col("d3").cast("double") / 1000.0 - mean) / sqrt(variance))
    d.join(broadcast(stats), "label")
      .select(col("vec_id"), col("label"),
        graft.util.Portable.val6(col("d2")).as("dist2"),
        graft.util.Portable.val6(z).as("z"),
        (z > zCut).as("is_outlier"))
      .orderBy("vec_id")
  }

  /** Index-SERVED ANN (q161) — the serving read of the index lifecycle
    * (build q153, maintain q158, serve here): q50's exact kNN contract
    * answered from the PERSISTED single-probe IVF index (the q153 table
    * machinery at nProbe = 1, so each vector lives in exactly ONE
    * bucket — the classic inverted-list layout). The per-query probe
    * lists are computed driver-side from the index's centroids
    * (nQueries × dim floats — metadata-sized), and the probed cid set
    * reaches the scan as a LITERAL IN-filter, so the bucketed table
    * prunes to the probed buckets at PLAN time (`SelectedBucketsCount`
    * in the scan, IvfServeSpec pins it): the serving read touches
    * ~nProbe/K of the corpus ON DISK, not merely post-filter — the
    * FAISS inverted-list read, expressed as Spark bucket pruning. */
  def ivfKnnIndexed(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val assigned = graft.sources.IvfIndex.table(spark, dir, nCentroids, 1)
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = centroidsOf(e, nCentroids)
    val probesLocal: Seq[(Long, Long, Array[Float])] =
      e.filter(col("vec_id") < nQueries).as[(Long, Array[Float])]
        .collect().toSeq
        .flatMap { case (qid, qv) =>
          cents.map { case (cid, cv) => (cid, cosOf(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nProbe)
            .map { case (cid, _) => (qid, cid, qv) }
        }
    val probedCids = probesLocal.map(_._2).distinct.sorted
    val probes = probesLocal.toDF("query_id", "cid", "qv")

    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes)
      .join(assigned.filter(col("cid").isin(probedCids: _*)), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) => (qi, ni, cosOf(qv, cv)) })
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** q163 — ANN served from the UNIFIED index artifact
    * ([[graft.sources.IvfIndex.unified]]): ONE index that is trained
    * (Lloyd centroids on the build-time corpus), persisted (cid-bucketed
    * table), incrementally maintained (delta appended against the
    * frozen centroids), and served here with multi-probe bucket pruning
    * — the full index lifecycle the four separate query families
    * (q155/q153/q158/q161) each exercised one verb of.
    *
    * Serving is q161's read shape over the trained index: per-query
    * probe lists computed driver-side against the trained centroids
    * (metadata-sized), the probed cid set reaching the scan as a
    * LITERAL IN-filter so the bucketed table prunes to probed buckets
    * at plan time (`SelectedBucketsCount` — IvfServeSpec pins it), and
    * the shared cosine kernel + fixed tiebreaks ranking top-k. The
    * oracle replays training, FULL assignment, and probes relationally
    * — a hash match proves trained + appended + pruned ≡ the
    * from-scratch dataflow. */
  def ivfKnnUnified(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      nCentroids: Int = AdaptiveCentroids, iters: Int = 2,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val h = graft.sources.IvfIndex.unified(spark, dir, nCentroids, iters)
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val probesLocal: Seq[(Long, Long, Array[Float])] =
      e.filter(col("vec_id") < nQueries).as[(Long, Array[Float])]
        .collect().toSeq
        .flatMap { case (qid, qv) =>
          h.centroids.map { case (cid, cv) => (cid, cosOfD(qv, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(nProbe)
            .map { case (cid, _) => (qid, cid, qv) }
        }
    val probedCids = probesLocal.map(_._2).distinct.sorted
    val probes = probesLocal.toDF("query_id", "cid", "qv")

    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes)
      .join(h.table.filter(col("cid").isin(probedCids: _*)), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, cv) => (qi, ni, cosOf(qv, cv)) })
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Recall@k of the IVF tier against the exact brute-force ranking —
    * the evaluation loop an ANN deployment tunes nProbe with. Probing
    * every bucket (nProbe = nCentroids) must give recall 1.0 exactly:
    * the candidate set becomes the full corpus and the ranking math/
    * tiebreaks are shared with [[knnCosine]]. */
  def ivfRecallAtK(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 4): Double = {
    val exact = knnCosine(spark, dir, nQueries, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ivfKnn(spark, dir, nQueries, k, nCentroids, nProbe)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.isEmpty) 1.0
    else (exact intersect approx).size.toDouble / exact.size
  }

  /** Random-hyperplane LSH bucketing: `nBits` sign bits per band from
    * deterministic pseudo-random hyperplanes (plane component (p, i) =
    * portable-hashed integer mapped to [-1, 1]). Near-identical vectors
    * agree on all sign bits with high probability, so candidate pairs
    * come from an equi-join on (band, signature) — never all-pairs. */
  def lshNearDups(spark: SparkSession, embeddings: DataFrame,
      dim: Int, nBands: Int = 4, nBits: Int = 8,
      threshold: Double = 0.95,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    // deterministic hyperplanes on the driver (tiny: nBands*nBits*dim)
    val planes: Array[Array[Double]] =
      Array.tabulate(nBands * nBits, dim) { (p, i) =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s"plane:$p:$i")
        (h.toDouble / Int.MaxValue) // [-1, 1], deterministic
      }
    def sign(p: Int): Column = {
      val plane = planes(p)
      // codegen'd one-pass dot (DotProductD); the literal plane array
      // constant-folds to a single Literal — loaded per task, not per
      // row. Same left-fold arithmetic as the interpreted form it
      // replaced (32 interpreted folds per row was the measured HOF
      // hazard).
      val prod = graft.functions.DotProductD.dotD(
        col("embedding"), array(plane.map(lit(_)): _*))
      when(prod >= 0, 1L).otherwise(0L)
    }
    val sigs = (0 until nBands).map { band =>
      val bits = (0 until nBits).map(bit =>
        sign(band * nBits + bit) * (1L << bit))
      struct(lit(band).as("band"), bits.reduce(_ + _).as("sig"))
    }
    val keyed = embeddings
      .select(col("vec_id"), col("embedding"),
        explode(array(sigs: _*)).as("bk"))
    // same skew guard as the IVF path ([[withBucketCap]]): a degenerate
    // corpus that collapses into one (band, sig) bucket pairs in n·cap,
    // not n². Census stays un-broadcast here — LSH bucket count scales
    // with the corpus (it's #distinct signatures, not a fixed K), so the
    // census joins back key-shuffled and AQE broadcasts it when small.
    val capped = withBucketCap(keyed, Seq("bk"), "vec_id", maxBucket,
      broadcastCensus = false)
    val l = capped.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("bk").as("bka"), col("_sub").as("suba"))
    val r = capped.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("bk").as("bkb"), col("_sub").as("subb"))
    l.join(r, col("bka") === col("bkb") && col("suba") === col("subb") &&
        col("ida") < col("idb"))
      .select("ida", "idb", "va", "vb").distinct()
      .withColumn("cos",
        graft.functions.CosineSim.cosineSim(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("ida"), col("idb"), graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("ida", "idb")
  }

  /** Deterministic Lloyd's k-means — the vector-quantization trainer
    * that produces [[ivfKnn]]'s coarse centroids (its Scaladoc defers to
    * exactly this). Classic big-data k-means dataflow:
    *
    *  - centroids live in the TASK CLOSURE (K×dim doubles), assignment
    *    is a map-only pass with a strict-< argmin (ties → lowest cid);
    *  - the update step is ONE map-side-combined shuffle at (cid, dim)
    *    grain — per-dimension sums as floor-scaled integers, so the
    *    accumulation is exact and ORDER-INDEPENDENT (float sums would be
    *    partition-order-dependent and break both determinism and the
    *    oracle);
    *  - per round: one collect of K×dim scaled longs to the driver (the
    *    same metadata-sized motion every distributed k-means pays).
    *
    * The integer-sum trick is what makes an ITERATIVE float algorithm
    * hash-verifiable: the DuckDB oracle replays both Lloyd rounds from
    * the same init (first K vectors) and must land on bit-identical
    * centroids, assignments, and distances. At 100 TB: same loop,
    * centroids broadcast instead of closure-captured, assignment output
    * written cid-bucketed so the IVF index build is the free by-product
    * of the final pass. */
  def kmeansQuantize(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val cents = lloydRounds(spark, ds, k, iters)
    val sizeW = Window.partitionBy("cid")
    kmeansAssign(spark, ds, cents)
      .select(col("vec_id"), col("cid"),
        graft.util.Portable.val6(col("dist2")).as("dist2"),
        count(lit(1)).over(sizeW).as("cluster_size"))
      .orderBy("vec_id")
  }

  private def distSq(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
    s
  }

  /** One L2 argmin assignment pass (strict <, ties → the first/lowest
    * cid in the sorted centroid array) — the map-only kernel both the
    * Lloyd update loop and [[kmeansQuantize]]'s final output share. */
  /** q219 — coreset / prototype selection: the `per` members CLOSEST
    * to their trained k-means centroid, per cluster — the data-pruning
    * move that keeps a small, geometry-covering core of each region
    * (prototypes for few-shot eval, seeds for active learning, or the
    * kept set when pruning to a budget). Complements q179/q203, which
    * REMOVE anomalies: this keeps the most central.
    *
    * Ranking determinism: raw L2 doubles are only guaranteed equal
    * across engines to the gate's 6-decimal contract, so the rank key
    * is the micro-floor-scaled INTEGER distance with vec_id as the
    * total tie-break — never the raw double. Scale: trainer + one
    * assignment pass (centroids broadcast, map-only) + a top-`per`
    * window at cluster grain. */
  def coresetSelect(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 2, per: Int = 5): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val cents = lloydRounds(spark, ds, k, iters)
    val w = Window.partitionBy("cid").orderBy(asc("d6"), asc("vec_id"))
    kmeansAssign(spark, ds, cents)
      .withColumn("d6",
        floor(col("dist2") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= per)
      .select(col("cid"), col("rn").as("rank"), col("vec_id"),
        (col("d6").cast("double") / lit(1000000.0)).as("dist2"))
      .orderBy("cid", "rank")
  }

  /** q229 — cluster-balanced sampling: the q184 temperature-mixture
    * discipline applied to EMBEDDING-SPACE clusters instead of
    * language labels — the "cluster-balanced curation" step the
    * cluster data card (q190) exists to budget. Per trained cluster,
    * an exact integer quota ∝ √size (temperature 0.5 flattens the
    * head, upsamples the tail), filled by the smallest seeded-hash
    * members — exact-count selection, not Bernoulli thresholds, and
    * reproducible across runs and engines.
    *
    * Scale: one assignment pass (centroids broadcast), cluster-grain
    * quota metadata, and one per-cluster rank window. */
  def clusterBalancedSample(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val cents = lloydRounds(spark, ds, k, iters)
    val asg = kmeansAssign(spark, ds, cents)
      .select(col("vec_id"), col("cid"))
      .localCheckpoint() // counts + the ranked selection
    val b = asg.count() / 2
    val c = asg.groupBy("cid").agg(count(lit(1)).as("c"))
    val w = c.withColumn("w9",
      floor(sqrt(col("c").cast("double")) * lit(1000000000.0) + lit(0.5))
        .cast("long"))
    val tot = w.agg(sum("w9").as("ww"))
    val t = w.crossJoin(broadcast(tot))
      .withColumn("n_target", expr(s"($b * w9) div ww"))
      .select(col("cid"), col("c"), col("n_target"))
    val rk = asg
      .withColumn("hk", graft.util.Portable.portable32(
        concat(lit("cbal:"), col("vec_id").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(asc("hk"), asc("vec_id"))))
    rk.join(broadcast(t), "cid")
      .select(col("vec_id"), col("cid"), col("c").as("cluster_size"),
        col("n_target"), col("rn").cast("int").as("rank"),
        (col("rn") <= col("n_target")).as("keep"))
      .orderBy("vec_id")
  }

  private def kmeansAssign(spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      cents: Array[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) =>
        var bestC = Long.MaxValue; var best = Double.PositiveInfinity
        var i = 0
        while (i < cs.length) {
          val s = distSq(v, cs(i)._2)
          if (s < best) { best = s; bestC = cs(i)._1 }
          i += 1
        }
        (id, bestC, best, v)
      }
    }.toDF("vec_id", "cid", "dist2", "embedding")
  }

  /** `iters` Lloyd rounds from the deterministic first-`k`-vectors init:
    * the trainer loop extracted from [[kmeansQuantize]] so the trained
    * centroids are reusable as an IVF centroid source. Per round, the
    * update is one map-side-combined shuffle at (cid, dim) grain with
    * floor-scaled integer sums (order-independent, oracle-replayable);
    * the round-trip to the driver is K×dim scaled longs — metadata. */
  private def lloydRounds(spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      k: Int, iters: Int): Array[(Long, Array[Double])] = {
    var cents: Array[(Long, Array[Double])] = ds.filter(_._1 < k)
      .collect().sortBy(_._1).map { case (id, v) => (id, v.map(_.toDouble)) }
    for (_ <- 1 to iters) {
      val sums = kmeansAssign(spark, ds, cents)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(floor(col("x").cast("double") * lit(1000000.0) + lit(0.5))
          .cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = sums.groupBy(_.getLong(0)).toArray.map { case (cid, rows) =>
        val c = new Array[Double](rows.length)
        rows.foreach(r => c(r.getInt(1)) =
          r.getLong(2).toDouble / 1000000.0 / r.getLong(3))
        (cid, c)
      }.sortBy(_._1)
    }
    cents
  }

  /** Trained IVF centroids: the [[kmeansQuantize]] trainer run at the
    * index's K, exposed as the centroid source [[ivfKnn]]'s Scaladoc
    * defers to. Deterministic end to end — fixed init (first K
    * vectors), fixed iteration count, order-independent integer-sum
    * updates — so an oracle replays the exact centroids and every
    * downstream assignment/recall decision. */
  def trainCentroids(spark: SparkSession, dir: String,
      k: Int, iters: Int = 2): Array[(Long, Array[Double])] =
    trainCentroidsOn(Tables.embeddings(spark, dir), k, iters)

  /** [[trainCentroids]] over an explicit corpus frame — the unified
    * index (q163) trains on the corpus AS OF BUILD TIME (the prev
    * snapshot), then freezes: appends assign against these centroids
    * without re-deriving, the same frozen contract as q158. Init =
    * the frame's vectors with `vec_id < k`. */
  def trainCentroidsOn(embeddings: DataFrame,
      k: Int, iters: Int = 2): Array[(Long, Array[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    lloydRounds(spark,
      embeddings.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])],
      k, iters)
  }

  /** [[cosOf]] against a double-precision centroid: same left-to-right
    * fold, float operand promoted per element — the arithmetic DuckDB's
    * `list_reduce` fold lands on when one list is already DOUBLE. */
  def cosOfD(a: Array[Float], c: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * c(i)
      na += a(i).toDouble * a(i).toDouble
      nb += c(i) * c(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Multi-probe cosine assignment against TRAINED (double) centroids —
    * [[ivfAssign]] with the centroid source swapped from "first K
    * vectors" to the Lloyd trainer's output. Same probe semantics:
    * each vector lands in its `nProbe` nearest centroids' buckets,
    * ties → lower cid. */
  def ivfAssignTrained(spark: SparkSession, embeddings: DataFrame,
      cents: Array[(Long, Array[Double])], nProbe: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val np = nProbe
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          cs.map { case (cid, cv) => (cid, cosOfD(v, cv)) }
            .sortBy { case (cid, s) => (-s, cid) }
            .take(np)
            .map { case (cid, _) => (id, cid, v) }
        }
      }.toDF("vec_id", "cid", "embedding")
  }

  /** q155: [[embeddingDedupIvf]] with TRAINED centroids — the k-means
    * trainer (q76's loop at the index K) feeding the IVF index, the
    * wiring a production pipeline runs: train → assign → bucketed
    * candidates → closure → verdict. Candidate generation, scoring,
    * closure and verdict are byte-for-byte the q141 stages; only the
    * centroid source changes. Trained centroids spread the corpus more
    * evenly than the first-K-vectors sample (measured: pair recall ≥
    * the first-K index at the same nProbe — TrainedIvfSpec pins it),
    * which is exactly why real deployments pay the training pass. */
  def embeddingDedupIvfTrained(spark: SparkSession, dir: String,
      nCentroids: Int = AdaptiveCentroids, iters: Int = 2,
      threshold: Double = 0.4,
      nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents =
      trainCentroids(spark, dir, resolveK(spark, dir, nCentroids), iters)
    val pairs = pairsFromAssigned(
      ivfAssignTrained(spark, e, cents, nProbe), threshold, nProbe)
    dedupVerdict(e.select("vec_id"), pairs)
  }

  /** [[ivfDedupPairRecall]] with trained centroids — the measurement
    * twin TrainedIvfSpec uses to pin trained ≥ first-K recall. EXACT
    * SIDE IS QUADRATIC: test harness, not an operator. */
  def ivfDedupPairRecallTrained(spark: SparkSession, dir: String,
      nCentroids: Int = 16, iters: Int = 2, threshold: Double = 0.4,
      nProbe: Int = 1): Double = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = trainCentroids(spark, dir, nCentroids, iters)
    val cand = pairsFromAssigned(
      ivfAssignTrained(spark, e, cents, nProbe), threshold, nProbe)
      .as[(Long, Long)].collect().toSet
    val vecs = e.as[(Long, Array[Float])].collect()
    val exact = (for {
      (ia, va) <- vecs.iterator
      (ib, vb) <- vecs.iterator
      if ia < ib && cosOf(va, vb) >= threshold
    } yield (ia, ib)).toSet
    if (exact.isEmpty) 1.0
    else (exact intersect cand).size.toDouble / exact.size
  }

  /** Per-label embedding centroids — mean pooling by class, the
    * prototype/centroid step of every embedding-space workflow
    * (class prototypes, centroid init for IVF, cluster drift checks).
    * Element-wise float means are order-dependent under parallel
    * summation, so each component is floor-scaled to integer millionths
    * BEFORE the sum (Portable discipline): `posexplode` fans the vector
    * to (label, pos) grain scan-locally, one map-side-combinable groupBy
    * carries BIGINT partial sums, and the mean divides back to double
    * once per (label, pos) — bit-stable at any partitioning. Shuffle
    * volume is labels × dim rows, independent of vector count. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(floor(col("x").cast("double") * lit(1000000.0) + lit(0.5))
          .cast("long")).as("s"))
      .select(col("label").cast("long").as("label"),
        col("pos").cast("long").as("pos"), col("n_vecs"),
        (col("s").cast("double") / lit(1000000.0) /
          col("n_vecs").cast("double")).as("centroid"))
      .orderBy("label", "pos")

  /** Dot of an embedding column against a DRIVER-KNOWN direction,
    * as the same left-fold expression tree the oracle states
    * (`list_reduce` over per-component products) — bit-identical. */
  private[graft] def dotLit(e: Column, v: Array[Double]): Column =
    aggregate(
      zip_with(e, array(v.map(lit).toIndexedSeq: _*),
        (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)

  /** One power-iteration step: component sums of x · (x·v), each
    * per-row contribution floor-scaled to BIGINT nano-units BEFORE
    * the cross-row sum. Returns the 64 integer sums ordered by pos. */
  private def powerStep(e: DataFrame, v: Array[Double]): Array[Long] = {
    val stepped = e
      .withColumn("dot", dotLit(col("embedding"), v))
      .select(posexplode(col("embedding")).as(Seq("pos", "x")), col("dot"))
      .groupBy("pos")
      .agg(sum(
        floor(col("x").cast("double") * col("dot") * lit(1000000000.0)
          + lit(0.5)).cast("long")).as("s9"))
      .orderBy("pos")
      .collect()
    stepped.map(_.getLong(1))
  }

  /** q185: leading principal direction of the embedding corpus by
    * distributed power iteration (2 steps from the uniform start),
    * and every vector's projection onto it — the 1-D "semantic axis"
    * used for embedding whitening, drift visualization and
    * diversity-aware subsampling. No eigensolver library: each step
    * is one corpus pass (dot with the broadcast direction is a
    * scan-local fold; component sums are a 64-row map-side-combinable
    * aggregate), so the iteration costs 2 passes at any corpus size
    * and the direction itself is metadata-sized driver state — the
    * same contract as the k-means trainer (q76).
    *
    * Determinism: per-row contributions floor-scale to BIGINT
    * nano-units before cross-row sums; the step normalizes by the
    * MAX |component| (exact integer argmax) instead of the L2 norm,
    * so no cross-component float summation ever happens driver-side
    * and the oracle can replay both steps verbatim. */
  /** The 2-step power-iteration direction (un-normalized beyond the
    * max-|component| step scaling) — shared by [[pcaPowerProjection]]
    * and its spec. */
  private[graft] def leadingDirection(spark: SparkSession,
      dir: String): Array[Double] = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val v0 = Array.fill(64)(0.125)
    def normed(s9: Array[Long]): Array[Double] = {
      val m = s9.map(math.abs).max
      s9.map(s => s.toDouble / m.toDouble)
    }
    normed(powerStep(e, normed(powerStep(e, v0))))
  }

  def pcaPowerProjection(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
    val v2 = leadingDirection(spark, dir)
    e.select(col("vec_id"), col("label"),
        graft.util.Portable.val6(dotLit(col("embedding"), v2)).as("proj"))
      .orderBy("vec_id")
  }

  /** q190: semantic cluster data card — the audit mart behind
    * cluster-balanced curation: train k-means on the embedding corpus
    * (q76's trainer verbatim), assign every vector, and report per
    * cluster its size, cohesion (mean squared distance to centroid),
    * dominant label with purity, and label entropy. This is how a
    * corpus owner discovers semantic domains, spots junk clusters
    * (large + incoherent + impure), and draws per-cluster sampling
    * budgets — the embedding-space sibling of the per-source card
    * (q180).
    *
    * Determinism: per-row d² milli-scales and entropy terms
    * nano-scale to BIGINTs before their cross-row sums; dominant
    * label ties break on the lower label. Scale: one map-only
    * assignment pass (centroids broadcast) plus cluster- and
    * (cluster, label)-grain aggregates — K×labels rows of state,
    * map-side combined, at any corpus size. */
  def clusterDataCard(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val cents = lloydRounds(spark, e, k, iters)
    val a = kmeansAssign(spark, e, cents)
    val lab = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val al = a.select("vec_id", "cid", "dist2").join(lab, "vec_id")
    val n = al.groupBy("cid").agg(count(lit(1)).as("n_vecs"),
      sum(floor(col("dist2") * lit(1000.0) + lit(0.5)).cast("long"))
        .as("sd3"))
    val lc = al.groupBy("cid", "label").agg(count(lit(1)).as("c"))
    val dom = lc.withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(desc("c"), asc("label"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("label").as("dominant_label"),
        col("c").as("n_dom"))
    val p = col("c").cast("double") / col("n_vecs")
    val ent = lc.join(n.select("cid", "n_vecs"), "cid")
      .groupBy("cid")
      .agg(sum(floor(-(p * log(p)) * lit(1000000000.0) + lit(0.5))
        .cast("long")).as("se9"))
    n.join(dom, "cid").join(ent, "cid")
      .select(col("cid"), col("n_vecs"), col("dominant_label"),
        (col("n_dom").cast("double") / col("n_vecs")).as("purity"),
        (col("se9").cast("double") / lit(1000000000.0))
          .as("label_entropy"),
        graft.util.Portable.val6(
          col("sd3").cast("double") / lit(1000.0) / col("n_vecs"))
          .as("mean_d2"))
      .orderBy("cid")
  }

  /** 1/log2(i+1) for ranked positions 1..5 — ONE set of double
    * literals shared by the Spark q197 mart and its oracle (the SQL
    * embeds `toString`, which round-trips to the identical double). */
  val NdcgDiscounts: Seq[Double] =
    (1 to 5).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** q197: retrieval evaluation mart — MRR@5 and nDCG@5 of the SERVED
    * index ranking (q161) against the exact brute ranking (q35) as
    * graded ground truth (gain 5..1 by true rank): the other half of
    * the index quality gauge next to recall (q186) — recall says how
    * many true neighbors survive pruning, nDCG says whether they
    * arrive in the right ORDER, MRR how fast the first one shows up.
    *
    * Determinism: gains are integers, discounts are shared double
    * literals, and every per-position term floor-scales to BIGINT
    * nano-units before the per-query sums; 1/rank floor-scales the
    * same way. Scale: bounded by the audit query sample exactly as
    * q186 — the corpus passes only through the pruned serve path. */
  def retrievalEvalMart(spark: SparkSession, dir: String): DataFrame = {
    val truth = knnCosine(spark, dir)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("trank"))
    val served = ivfKnnIndexed(spark, dir)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("srank"))
    def dOf(rankCol: Column): Column =
      NdcgDiscounts.zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (dv, i)) => when(rankCol === (i + 1), lit(dv))
          .otherwise(acc)
      }
    val g = served.join(truth, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("srank"),
        when(col("trank").isNotNull, lit(6) - col("trank"))
          .otherwise(lit(0)).as("gain"))
    val per = g.groupBy("query_id").agg(
      sum(floor(col("gain").cast("double") * dOf(col("srank"))
        * lit(1000000000.0) + lit(0.5)).cast("long")).as("dcg9"),
      min(when(col("gain") > 0, col("srank"))).as("fr"))
    val ideal = truth.groupBy("query_id").agg(
      sum(floor((lit(6) - col("trank")).cast("double") * dOf(col("trank"))
        * lit(1000000000.0) + lit(0.5)).cast("long")).as("idcg9"))
    per.join(ideal, "query_id")
      .select(col("query_id"),
        when(col("fr").isNull, lit(0.0))
          .otherwise(floor(lit(1000000000.0) / col("fr").cast("double")
              + lit(0.5)).cast("long").cast("double") / lit(1000000000.0))
          .as("mrr"),
        (col("dcg9").cast("double") / lit(1000000000.0)).as("dcg"),
        (col("dcg9").cast("double") / col("idcg9").cast("double"))
          .as("ndcg"))
      .orderBy("query_id")
  }

  /** q195: embedding-space drift monitor — the PSI gate (q169's
    * arithmetic verbatim) applied to the 1-D projections of q185's
    * leading principal direction: reference population vs current
    * population histogrammed over clamped projection buckets, PSI
    * read off the reduced grain. This is how embedding drift (new
    * model version, new crawl mix, upstream encoder change) is
    * caught WITHOUT labels: project, bucket, compare. Here the
    * populations are the label<5 vs label>=5 halves, which share the
    * same generator — PSI lands near 0.01, the correct NO-drift
    * reading for statistically identical populations (the monitor's
    * healthy baseline; an encoder or mix change moves the same
    * statistic, and Round9Spec plants one to prove it).
    *
    * Scale: the projection is one map-only pass (direction
    * broadcast); state is the ≤16-bucket histogram regardless of
    * corpus size; PSI combines over that grain with the same
    * floor-scaled integer contributions as q169/q176 — runnable
    * per-ingest at any scale, or continuously in the q176 shape. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val v2 = leadingDirection(spark, dir)
    val proj = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        dotLit(col("embedding"), v2).as("proj"))
    val bucket = least(greatest(floor(col("proj") * lit(2.0)).cast("long"),
      lit(-8L)), lit(7L))
    val g = proj
      .select((col("label") < 5).as("is_a"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("n_b"))
      .withColumn("event_type", lit("embedding"))
      .select("event_type", "bucket", "n_a", "n_b")
    Analytics.psiFrom(g)
  }

  /** q186: recall@5 audit of the SERVED IVF path (q161 — the
    * persisted, bucket-pruned index read) against the exact
    * brute-force ranking (q35) on the same query set — the index
    * quality gauge a production vector deployment monitors
    * continuously: did pruning to nProbe buckets cost ground-truth
    * neighbors? Composes the two already-gated contracts and reduces
    * to pure id-set arithmetic (left join on ids + count), so no new
    * float surface exists; the oracle replays both paths relationally
    * and must land on the identical per-query hit counts.
    *
    * Scale: the expensive side (brute) is bounded by the AUDIT query
    * sample, never the corpus — at 100 TB you audit a few hundred
    * queries against the index while the corpus passes only through
    * the already-pruned serve path. */
  def annRecallAudit(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val brute = knnCosine(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val served = ivfKnnIndexed(spark, dir)
      .select(col("query_id").as("qi"), col("neighbor_id").as("ni"))
    brute.join(served,
        col("query_id") === col("qi") && col("neighbor_id") === col("ni"),
        "left")
      .groupBy("query_id")
      .agg(count(col("ni")).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("recall_at_5"))
      .orderBy("query_id")
  }

  /** q203 — label-noise detection by kNN disagreement (the
    * "confident-learning-lite" audit a supervised corpus runs before
    * training): a sampled example is SUSPECT when the majority of its
    * k nearest neighbors carry a different label. Complements q179's
    * centroid z-score — that flags examples far from their OWN class;
    * this flags examples deep inside ANOTHER class, which a centroid
    * distance cannot see (an example can sit close to its class mean
    * yet be surrounded by foreign neighbors in a multi-modal class).
    *
    * Neighbors here are EXACT (the auditable ground truth): the audit
    * sample (vec_id ≡ 0 mod `sampleMod`) broadcasts against the corpus
    * scan, ranked by the same portable cosine kernel as q35, with
    * neighbor_id as the deterministic tiebreak. The majority label
    * breaks ties toward the SMALLEST label so the verdict is total.
    *
    * Scale: cost is |sample| × corpus map work with NO shuffle on the
    * corpus side (the sample broadcasts); the corpus-sized output fan-in
    * is the per-query top-k window, keyed on query_id. At 100 TB the
    * same audit serves from the IVF index (q163's unified handle) and
    * keeps this brute pass for a held-out calibration slice — the
    * recall-audit discipline of q186. */
  def labelNoiseKnn(spark: SparkSession, dir: String,
      k: Int = 10, sampleMod: Int = 4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
    val q = e.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("label").as("nlabel"))
    val pairs = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qlabel"), col("neighbor_id"),
        col("nlabel"), col("qv"), col("cv"))
      .as[(Long, Long, Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ql, ni, nl, qv, cv) =>
        (qi, ql, ni, nl, cosOf(qv, cv))
      })
      .toDF("query_id", "qlabel", "neighbor_id", "nlabel", "cos")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    val top = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .localCheckpoint() // two consumers: disagreement + majority vote

    val dis = top.groupBy("query_id", "qlabel")
      .agg(sum(when(col("nlabel") =!= col("qlabel"), 1L).otherwise(0L))
        .as("n_disagree"))
    val mw = Window.partitionBy("query_id")
      .orderBy(desc("cnt"), asc("nlabel"))
    val maj = top.groupBy("query_id", "nlabel")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("mr", row_number().over(mw))
      .filter(col("mr") === 1)
      .select(col("query_id"), col("nlabel").as("majority_label"))

    dis.join(maj, "query_id")
      .select(col("query_id"), col("qlabel").as("label"),
        col("n_disagree"), col("majority_label"),
        (col("n_disagree") * lit(2L) > lit(k.toLong)).as("suspect"))
      .orderBy("query_id")
  }

  /** Prefix cosine similarities in ONE pass: cos over a(0..d-1) for
    * each d in `prefixes` (ascending). The partial accumulators at a
    * prefix boundary ARE the prefix fold — same left-to-right IEEE
    * order as [[cosOf]] and DuckDB's `list_reduce` over
    * `range(1, d+1)`, so every prefix cosine is oracle-portable. */
  private[graft] def cosPrefixes(a: Array[Float], b: Array[Float],
      prefixes: Array[Int]): Array[Double] = {
    val out = new Array[Double](prefixes.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0; var p = 0
    while (i < a.length && p < prefixes.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
      if (i == prefixes(p)) {
        out(p) = dot / (math.sqrt(na) * math.sqrt(nb))
        p += 1
      }
    }
    out
  }

  /** q287: matryoshka-truncation recall audit — how much ANN quality
    * survives serving from a PREFIX of each embedding (the
    * Matryoshka-representation deployment question: store 64 dims,
    * serve from the first 8/16/32 to cut index bytes and dot-product
    * cost). For each prefix d, exact top-k by prefix-d cosine is
    * compared against the full-dimension top-k (the truth set);
    * recall@k per prefix is the integer hit count over |Q|·k.
    *
    * Scale shape: ONE broadcast-query pass over the corpus computes
    * all prefix cosines simultaneously (the prefix folds are partial
    * accumulators of the full fold — no extra arithmetic beyond the
    * snapshot), then one per-(prefix, query) top-k window over the
    * candidate rows. At 100 TB the corpus-side scan reads the
    * embedding column once for all prefixes; the decision output —
    * which prefix clears the recall bar — is what sizes the serving
    * index. All ranking keys are deterministic (IEEE-identical
    * prefix folds, neighbor_id tiebreak); recall is an exact integer
    * ratio, so the DuckDB oracle matches bit-for-bit. */
  def matryoshkaRecall(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5,
      prefixes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    import spark.implicits._
    val pfx = prefixes.sorted.toArray
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"))
    val pairs = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (qi, ni, qv, cv) =>
          val cs = cosPrefixes(qv, cv, pfx)
          var p = 0
          val rows = new Array[(Long, Long, Int, Double)](pfx.length)
          while (p < pfx.length) {
            rows(p) = (qi, ni, pfx(p), cs(p)); p += 1
          }
          rows
        }
      }
      .toDF("query_id", "neighbor_id", "prefix_dim", "cos")
    val w = Window.partitionBy("prefix_dim", "query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    val top = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("prefix_dim"), col("query_id"), col("neighbor_id"))
      .localCheckpoint() // consumed per-prefix AND as the d=full truth
    val full = pfx.last
    val truth = top.filter(col("prefix_dim") === full)
      .select(col("query_id").as("tq"), col("neighbor_id").as("tn"))
    top.join(truth,
        col("query_id") === col("tq") && col("neighbor_id") === col("tn"),
        "left")
      .groupBy("prefix_dim")
      .agg(count(col("tn")).as("hits"),
        countDistinct(col("query_id")).as("n_queries"))
      .select(col("prefix_dim"), col("hits"), col("n_queries"),
        (col("hits").cast("double") /
          (col("n_queries") * lit(k.toLong)).cast("double"))
          .as("recall_at_k"))
      .orderBy("prefix_dim")
  }

  /** Micro-scaled integer cosine DISTANCE — floor((1−cos)·10⁶ + 0.5),
    * the cross-engine-total ordering key for [[kcenterSelect]];
    * mirrors the oracle's expression operand-for-operand. */
  private def cosDist6(a: Array[Float], b: Array[Float]): Long =
    math.floor((1.0 - cosOf(a, b)) * 1000000.0 + 0.5).toLong

  /** q294 — greedy k-center (Gonzalez 2-approximation): the classic
    * DIVERSE-subset selection for training data — where the coreset
    * (q219) picks cluster-typical points, k-center picks maximally
    * SPREAD ones (each round adds the point farthest from everything
    * chosen so far), covering the embedding space's extremes with k
    * exemplars and bounding every point's distance to its nearest
    * center within 2× optimal.
    *
    * Scale: each of the k−1 rounds is ONE map-side pass (the ≤k
    * selected vectors travel in the task closure) + a
    * TakeOrderedAndProject argmax — k·O(n/p) work, no shuffle of the
    * corpus, no pairwise blow-up; the per-round 1-row collect is
    * metadata-grain (the q76 trainer's discipline). Distances are
    * micro-scaled BIGINTs so argmax/argmin ordering is exact on both
    * engines; ties break on vec_id.
    *
    * Output: every vector assigned to its nearest selected center
    * (pick_no = selection order) — `dist`'s max over rows IS the
    * coverage radius the 2-approximation bounds. */
  def kcenterSelect(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val seed = ds.filter(_._1 == 0L).head()
    var selected = Vector[(Int, Long, Array[Float])]((0, seed._1, seed._2))
    for (pick <- 1 until k) {
      val bc = spark.sparkContext.broadcast(selected)
      val next = ds.mapPartitions { it =>
          val sel = bc.value
          it.map { case (id, v) =>
            (id, sel.iterator.map(c => cosDist6(v, c._3)).min, v)
          }
        }
        .toDF("vec_id", "dmin6", "embedding")
        .filter(!col("vec_id").isin(selected.map(_._2): _*))
        .orderBy(desc("dmin6"), asc("vec_id"))
        .as[(Long, Long, Array[Float])]
        .head()
      selected :+= ((pick, next._1, next._3))
    }
    val bcFinal = spark.sparkContext.broadcast(selected)
    ds.mapPartitions { it =>
        val sel = bcFinal.value
        it.map { case (id, v) =>
          // argmin over (d6 ASC, pick_no ASC) — the oracle's ordering
          val best = sel.iterator
            .map(c => (cosDist6(v, c._3), c._1, c._2)).min
          (id, best._3, best._2, best._1)
        }
      }
      .toDF("vec_id", "center_id", "pick_no", "d6")
      .select(col("vec_id"), col("center_id"),
        col("pick_no").cast("int").as("pick_no"),
        (col("d6").cast("double") / lit(1000000.0)).as("dist"))
      .orderBy("vec_id")
  }

  /** Sign-bit pack: one bit per dimension (set iff x ≥ 0), 32 dims per
    * long word — the 1-bit BINARY QUANTIZATION every 2024-era vector
    * store added (32× smaller than float32; Hamming distance between
    * sign patterns tracks angular distance). Word layout is fixed
    * little-endian-by-dimension so the oracle's power-of-two sums
    * reproduce it bit-for-bit. */
  def bqPack(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 31) / 32)
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0f) words(i >> 5) |= 1L << (i & 31)
      i += 1
    }
    words
  }

  /** Hamming distance between two packed sign patterns. */
  def bqHamming(a: Array[Long], b: Array[Long]): Int = {
    var h = 0; var i = 0
    while (i < a.length) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** q314 — binary-quantization ANN serve: shortlist by Hamming
    * distance over 1-bit sign codes (XOR + POPCNT on packed longs —
    * 32× less I/O than the float corpus, the cheapest rung of the
    * quantization ladder below int8 q166 / PQ q175), then re-rank the
    * shortlist with exact float cosine. The response carries BOTH the
    * Hamming shortlist rank evidence and the exact re-ranked cosine,
    * so the gate pins the quantizer itself, not just the final order.
    *
    * Scale: the codes table is d/8 bytes per vector — at 100 TB of
    * floats the sign-code sweep reads ~3 TB and the float table is
    * touched only `shortN` rows per query (the q293 refine
    * discipline); composes with IVF bucketing for the non-exhaustive
    * path. Queries broadcast (the sanctioned ≤10-row q35 class); the
    * shortlist/re-rank windows run per query on ≤shortN rows. */
  def bqKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, shortN: Int = 32, k: Int = 5): DataFrame = {
    import spark.implicits._
    val codes = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, bqPack(v), v) })
      .toDF("vec_id", "code", "vec")
    val q = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"),
        col("vec").as("qv"))
    val ham = broadcast(q)
      .join(codes, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qcode"), col("code"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (qi, ni, qc, nc) =>
        (qi, ni, bqHamming(qc, nc)) })
      .toDF("query_id", "neighbor_id", "hamming")
    val short = ham.withColumn("hrn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(asc("hamming"), asc("neighbor_id"))))
      .filter(col("hrn") <= shortN)
    val rer = short
      .join(q.select(col("query_id"), col("qv")), Seq("query_id"))
      .join(codes.select(col("vec_id").as("neighbor_id"),
        col("vec").as("nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        col("qv"), col("nv"))
      .as[(Long, Long, Int, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, h, qv, nv) =>
        (qi, ni, h, cosOf(qv, nv)) })
      .toDF("query_id", "neighbor_id", "hamming", "cos")
    rer.withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        col("hamming"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** q327 — BQ-over-IVF composed serve: the 1-bit analogue of q177's
    * IVFADC — q50's coarse quantizer prunes to nProbe buckets, the
    * q314 sign-code Hamming shortlist ranks INSIDE the surviving
    * buckets (XOR+POPCNT over d/8-byte codes — the only per-candidate
    * read), and exact float cosine re-ranks the ≤shortN survivors.
    * At 100 TB this is the serve that touches ~nProbe/K of the CODES
    * table (3 TB-equivalent of a 100 TB float corpus) and shortN rows
    * of floats per query — both prunings compose multiplicatively.
    *
    * Shapes: bucket pruning is the q50 equi-join on cid; the Hamming
    * kernel carries only (id, code); raw vectors are re-joined ONLY
    * for the shortlist (the q293 refine discipline). */
  def bqIvfKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nCentroids: Int = 16,
      nProbe: Int = 4, shortN: Int = 32): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents: Array[(Long, Array[Float])] =
      e.filter(col("vec_id") < nCentroids)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = e.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var bestC = -1L
          var best = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val s = cosOf(v, cs(i)._2)
            if (s > best) { best = s; bestC = cs(i)._1 }
            i += 1
          }
          (id, bestC, bqPack(v))
        }
      }.toDF("vec_id", "cid", "code")
    val probes = e.filter(col("vec_id") < nQueries)
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        bc.value.map { case (cid, cv) => (qid, cid, cosOf(qv, cv)) } }
      .toDF("query_id", "cid", "pcos")
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(desc("pcos"), asc("cid"))))
      .filter(col("rn") <= nProbe)
      .select("query_id", "cid")
    val qCodes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val ham = probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qCodes), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qcode"), col("code"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (qi, ni, qc, nc) =>
        (qi, ni, bqHamming(qc, nc)) })
      .toDF("query_id", "neighbor_id", "hamming")
    val short = ham.withColumn("hrn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(asc("hamming"), asc("neighbor_id"))))
      .filter(col("hrn") <= shortN)
    short
      .join(broadcast(e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        col("qv"), col("nv"))
      .as[(Long, Long, Int, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, h, qv, nv) =>
        (qi, ni, h, cosOf(qv, nv)) })
      .toDF("query_id", "neighbor_id", "hamming", "cos")
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        col("hamming"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** q316 — margin-based BITEXT MINING (Artetxe & Schwenk 2019): the
    * candidate-pair scorer behind every mined parallel corpus
    * (CCMatrix/LASER class). Treating label < 5 as the source side and
    * label ≥ 5 as the target side, each source query's target
    * candidates are scored by the RATIO margin
    *
    *   margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2)
    *
    * where avgF/avgB are the means of the k nearest cosines in each
    * DIRECTION — the normalization that kills hub vectors a raw-cosine
    * threshold can't. Every cosine nano-floors to an integer before
    * the 4-term neighborhood sums, and the margin is ONE fixed IEEE
    * tree over those exact integers (8·cos9 / (ΣF9 + ΣB9), micro-
    * floored) — deterministic on both engines.
    *
    * Scale: both kNN legs are the broadcast-query-set scorer at gate
    * scale and ride the IVF index (q161/q170) at corpus scale; the
    * backward leg scores only the ≤ nQueries·k distinct candidates.
    * Emits the best target per source with the accept flag at the
    * standard 1.05 threshold. */
  def bitextMargin(spark: SparkSession, dir: String,
      nQueries: Int = 30, k: Int = 4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val src = e.filter(col("label") < 5)
      .select(col("vec_id"), col("embedding"))
    val tgt = e.filter(col("label") >= 5)
      .select(col("vec_id"), col("embedding"))
    def cos9Pairs(qs: DataFrame, cs: DataFrame): DataFrame =
      broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
        .join(cs.select(col("vec_id").as("cid"), col("embedding").as("cv")),
          col("qid") =!= col("cid"))
        .as[(Long, Array[Float], Long, Array[Float])]
        .mapPartitions(_.map { case (qi, qv, ci, cv) =>
          (qi, ci, math.floor(cosOf(qv, cv) * 1e9 + 0.5).toLong) })
        .toDF("qid", "cid", "cos9")
    val fwd = cos9Pairs(src.filter(col("vec_id") < nQueries), tgt)
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("cos9"), asc("cid"))))
      .filter(col("rn") <= k)
      .localCheckpoint() // feeds ΣF9, the candidate set, and the picks
    val sumF = fwd.groupBy("qid").agg(sum("cos9").as("sf9"))
    val cands = fwd.select(col("cid")).distinct()
    val bwd = cos9Pairs(
        tgt.join(cands, tgt("vec_id") === cands("cid"), "left_semi"), src)
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("cos9"), asc("cid"))))
      .filter(col("rn") <= k)
      .groupBy(col("qid").as("cand_id")).agg(sum("cos9").as("sb9"))
    fwd.select(col("qid").as("src_id"), col("cid").as("tgt_id"),
        col("cos9"))
      .join(broadcast(sumF.withColumnRenamed("qid", "src_id")), Seq("src_id"))
      .join(broadcast(bwd), col("tgt_id") === col("cand_id"))
      // one fixed IEEE tree over exact integers (the q263 discipline);
      // integer `div` would diverge from the oracle's floor-division
      // on a negative-cosine pick
      .withColumn("margin6",
        floor((lit(8.0) * col("cos9").cast("double"))
          / (col("sf9") + col("sb9")).cast("double")
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("mrn", row_number().over(Window.partitionBy("src_id")
        .orderBy(desc("margin6"), asc("tgt_id"))))
      .filter(col("mrn") === 1)
      .select(col("src_id"), col("tgt_id"),
        (col("cos9").cast("double") / lit(1.0e9)).as("cos_sim"),
        (col("margin6").cast("double") / lit(1.0e6)).as("margin"),
        (col("margin6") >= 1050000L).as("accepted"))
      .orderBy("src_id")
  }
}
