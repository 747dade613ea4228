package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental re-curation — the day-2 operation of a living corpus
  * (q157): when a snapshot changes (docs added, removed, re-crawled),
  * re-verdict ONLY the delta instead of recomputing the whole curation
  * chain, and prove the merged verdict table equals the full recompute.
  *
  * Stage locality decides what can be reused:
  *   - lang / quality / repetition are doc-local → unchanged docs keep
  *     their stored verdicts verbatim; only added/changed docs recompute.
  *   - decontamination is doc-local GIVEN a fixed benchmark registry
  *     (the eval suite is external and versioned, not part of the
  *     corpus) → same reuse.
  *   - near-dup canonicality is corpus-GLOBAL: an added doc can join two
  *     old clusters, a removed doc can have been a canonical or a cut
  *     vertex. The incremental closure recomputes ONLY affected
  *     components: new candidate edges come from band-joining the DELTA
  *     signatures against the full signature table (never all-pairs);
  *     a prev component is affected iff it touches a gone/changed doc or
  *     a new edge; connected components rerun on the affected subgraph
  *     alone, and every other cluster keeps its stored label. The
  *     affected subgraph is edge-closed: a kept edge joins two docs of
  *     one prev component (both affected or both not), and a new edge's
  *     endpoints are both marked affected.
  *
  * Scale shape: delta stages scan delta docs only; the band join is
  * |delta bands| ⋈ |corpus bands| — an equi-join on the band key, the
  * same bucketed shape as the full LSH pass but with one tiny side; the
  * CC rerun is bounded by the affected-cluster mass, not the corpus.
  * All merges are doc-keyed joins/anti-joins. At 100 TB the prev
  * artifacts are tables on stable storage (staged here per fixture
  * signature under /tmp, the Scd2-history pattern); a deployment's
  * nightly delta run reads them in place.
  *
  * Contract: "unchanged" (by content fingerprint) implies the RAW text
  * is unchanged, so stored MinHash signatures stay valid — true for
  * snapshot derivations keyed on the same normalization as
  * [[TextOps.contentFp]] plus byte-identical carryover, as here.
  *
  * The driver gate is the strongest possible equality proof: the Spark
  * side answers q157 INCREMENTALLY while the oracle recomputes the full
  * chain on the new snapshot from scratch — a hash match means
  * incremental ≡ full on every row.
  */
object IncrementalCuration {

  /** Previous snapshot (v1): drops doc_id ≡ 0 (mod 6), original text. */
  def snapshotPrev(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") % 6 =!= 0)

  /** Current snapshot (v2): drops doc_id ≡ 0 (mod 7); doc_id ≡ 0
    * (mod 11) re-crawled with edited text. Docs in v2 but not v1
    * (doc_id ≡ 0 mod 6) are the additions. */
  def snapshotCur(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [edited]")))
          .otherwise(col("text")).as("text"))
      .filter(col("doc_id") % 7 =!= 0)

  /** The external benchmark registry (fixed across snapshots):
    * doc_id ≡ 0 (mod 25), original text. */
  def evalRegistry(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % TextOps.EvalMod === 0)

  /** Doc-local stage verdicts (lang, quality, repetition,
    * decontamination) for a corpus frame — the q145 stage definitions,
    * parameterized. Output grain = train docs (benchmark ids excluded). */
  def localVerdictsOn(corpus: DataFrame, evalDocs: DataFrame): DataFrame = {
    val lang = corpus.select(col("doc_id"), (col("lang") === "en").as("lang_ok"))
    val qual = corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))
          >= 0.35 && size(col("w")) >= 20).as("quality_ok"))
    val rep = TextOps.repetitionStatsOn(corpus)
      .select(col("doc_id"), col("keep").as("rep_ok"))
    val dec = TextOps
      .decontaminateOn(corpus.filter(col("doc_id") % TextOps.EvalMod =!= 0),
        evalDocs)
      .select(col("doc_id"), (!col("is_contaminated")).as("decon_ok"))
    dec.join(lang, "doc_id").join(qual, "doc_id").join(rep, "doc_id")
      .select("doc_id", "lang_ok", "quality_ok", "rep_ok", "decon_ok")
  }

  /** Full component assignment for a corpus: near-dup closure labels,
    * singletons = own id. */
  private def componentsOn(corpus: DataFrame, pairs: DataFrame): DataFrame =
    corpus.select("doc_id")
      .join(Graphs.components(pairs, "ida", "idb")
        .withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))

  /** FULL verdict recompute on a corpus frame — the non-incremental
    * reference the spec compares against (and the semantics the DuckDB
    * oracle replays). Same columns as q145 plus nothing: status joins
    * happen at the query layer. */
  def fullVerdictsOn(corpus: DataFrame, evalDocs: DataFrame): DataFrame = {
    // uncapped, like the oracle and the incremental delta join: the
    // bucket cap's sub-split keys on bucket SIZE, which differs between
    // a full pass and a delta pass (SCALE.md round-5 note)
    val pairs = TextOps
      .minhashNearDupsOn(corpus, TextOps.NearDupJaccard, Long.MaxValue)
      .select("ida", "idb")
    val ded = componentsOn(corpus, pairs)
      .select(col("doc_id"),
        (col("doc_id") === col("component")).as("dedup_ok"))
    localVerdictsOn(corpus, evalDocs)
      .join(ded, "doc_id")
      .withColumn("keep", col("lang_ok") && col("quality_ok")
        && col("rep_ok") && col("decon_ok") && col("dedup_ok"))
  }

  /** The stored artifacts of the previous curation run — in production
    * these are tables; [[stagedArtifacts]] materializes them per fixture
    * signature so repeated runs (and the bench) pay only the delta. */
  case class PrevArtifacts(verdicts: DataFrame, sigs: DataFrame,
      pairs: DataFrame, comp: DataFrame)

  /** Compute the previous run's artifacts from scratch (what the prior
    * nightly run would have persisted). */
  def artifactsOf(prev: DataFrame, evalDocs: DataFrame): PrevArtifacts = {
    // uncapped for the same reason as fullVerdictsOn: capped stored
    // pairs + an uncapped delta join would diverge on a skewed corpus
    val pairs = TextOps
      .minhashNearDupsOn(prev, TextOps.NearDupJaccard, Long.MaxValue)
      .select("ida", "idb")
    PrevArtifacts(
      verdicts = localVerdictsOn(prev, evalDocs),
      sigs = TextOps.signaturesOn(prev).toDF(),
      pairs = pairs,
      comp = componentsOn(prev, pairs))
  }

  /** The DELTA view of one incremental step — the rows that CHANGED,
    * keyed, so a continuous maintainer (q162) can commit them as
    * upserts/deletes into log-structured state tables
    * ([[graft.sources.DeltaLog]]) instead of rewriting the full
    * artifacts: per batch, the written rows scale with the delta
    * (verdict/sig upserts = changed docs; pair churn = edges touching
    * gone docs + new edges; comp upserts = the affected-cluster mass),
    * never with the corpus. Applying (delete `removedIds`/`pairDels`,
    * then upsert) onto the prev state tables reproduces
    * [[IncrementalResult.artifacts]] row-for-row. */
  case class ArtifactDeltas(
      removedIds: DataFrame, // delete keys for verdicts/sigs/comp (doc_id)
      verdictUps: DataFrame, // recomputed local verdicts of added/changed docs
      sigUps: DataFrame,     // recomputed signatures of added/changed docs
      pairUps: DataFrame,    // new candidate edges
      pairDels: DataFrame,   // prev edges touching a gone/changed doc (ida, idb)
      compUps: DataFrame,    // fresh labels for the affected-cluster ids in cur
      statusDelta: DataFrame) // (doc_id, status) of added/changed docs

  /** One incremental step's full output: the verdict table, the updated
    * artifacts (the next step's inputs), and the keyed deltas that
    * produce those artifacts from the previous ones. */
  case class IncrementalResult(verdicts: DataFrame,
      artifacts: PrevArtifacts, deltas: ArtifactDeltas)

  /** Row shapes of the artifact tables, as case classes so the empty
    * frames' schemas DERIVE from one definition each (a hand-mirrored
    * StructType would silently drift if e.g. [[TextOps.DocSig]] gained
    * a field, and only fail at runtime in q162's first batch). */
  private case class LocalVerdict(doc_id: Long, lang_ok: Boolean,
      quality_ok: Boolean, rep_ok: Boolean, decon_ok: Boolean)
  private case class Pair(ida: Long, idb: Long)
  private case class CompRow(doc_id: Long, component: Long)

  /** Artifacts of an EMPTY previous corpus (the continuous maintainer's
    * initial state before the first batch). */
  def emptyArtifacts(spark: SparkSession): PrevArtifacts = {
    import org.apache.spark.sql.Encoders
    def empty(schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    PrevArtifacts(
      verdicts = empty(Encoders.product[LocalVerdict].schema),
      sigs = empty(Encoders.product[TextOps.DocSig].schema),
      pairs = empty(Encoders.product[Pair].schema),
      comp = empty(Encoders.product[CompRow].schema))
  }

  /** Incremental re-verdict: merge stored prev verdicts with delta-only
    * recompute; returns the q145 verdict columns plus the diff `status`
    * of each surviving doc. */
  def incrementalVerdicts(prevArt: PrevArtifacts, prev: DataFrame,
      cur: DataFrame, evalDocs: DataFrame): DataFrame =
    incrementalStep(prevArt, prev, cur, evalDocs).verdicts

  /** [[incrementalVerdicts]] plus the updated artifact tables. */
  def incrementalStep(prevArt: PrevArtifacts, prev: DataFrame,
      cur: DataFrame, evalDocs: DataFrame): IncrementalResult = {
    // 1. snapshot diff by content fingerprint (the q150 operator)
    val f1 = prev.select(col("doc_id"), TextOps.contentFp(col("text")).as("fp1"))
    val f2 = cur.select(col("doc_id"), TextOps.contentFp(col("text")).as("fp2"))
    val diff = f1.join(f2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
      .localCheckpoint() // read thrice below; never replay the fp join
    val deltaIds = diff.filter(col("status").isin("added", "changed"))
      .select("doc_id")
    val goneIds = diff.filter(col("status").isin("removed", "changed"))
      .select("doc_id")
    val unchangedIds = diff.filter(col("status") === "unchanged")
      .select("doc_id")

    // 2. doc-local stages: reuse stored verdicts for unchanged docs,
    //    recompute for the delta only
    val deltaDocs = cur.join(deltaIds, "doc_id")
    val localDelta = localVerdictsOn(deltaDocs, evalDocs)
    val localV2 = prevArt.verdicts.join(unchangedIds, "doc_id")
      .unionByName(localDelta)

    // 3. near-dup closure, incrementally
    val deltaSigs = TextOps.signaturesOn(deltaDocs).toDF().localCheckpoint()
    val sigsV2 = prevArt.sigs.join(goneIds, Seq("doc_id"), "left_anti")
      .unionByName(deltaSigs)
    // new candidate edges: delta bands ⋈ all-v2 bands (includes
    // delta-delta), normalized ida < idb, then the exact Jaccard check
    val bl = TextOps.bandsOf(deltaSigs)
      .select(col("doc_id").as("ida"), col("band"), col("h1"), col("h2"))
    val br = TextOps.bandsOf(sigsV2)
      .select(col("doc_id").as("idb"), col("band").as("bandr"),
        col("h1").as("h1r"), col("h2").as("h2r"))
    val cand = bl.join(br, col("band") === col("bandr")
        && col("h1") === col("h1r") && col("h2") === col("h2r")
        && col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("ida"),
        greatest(col("ida"), col("idb")).as("idb"))
      .distinct()
    val newPairs = TextOps
      .exactJaccard(cand, sigsV2.select(col("doc_id"), col("shs")))
      .filter(col("jaccard") >= TextOps.NearDupJaccard)
      .select("ida", "idb")
      .localCheckpoint() // feeds touched-set AND the union; compute once
    val keptPairs = prevArt.pairs
      .join(goneIds.withColumnRenamed("doc_id", "ida"), Seq("ida"), "left_anti")
      .join(goneIds.withColumnRenamed("doc_id", "idb"), Seq("idb"), "left_anti")
    val pairsV2 = keptPairs.select("ida", "idb")
      .unionByName(newPairs).distinct()

    // 4. affected components: touch = gone/changed/delta docs and new
    //    edges' endpoints; rerun CC on their clusters only
    val touched = goneIds.unionByName(deltaIds)
      .unionByName(newPairs.select(col("ida").as("doc_id")))
      .unionByName(newPairs.select(col("idb").as("doc_id")))
      .distinct()
    val affComps = prevArt.comp.join(touched, "doc_id")
      .select("component").distinct()
    val affIds = prevArt.comp.join(affComps, "component").select("doc_id")
      .unionByName(deltaIds) // additions have no prev label
      .distinct()
      .localCheckpoint() // two consumers (subgraph filter + assignment)
    val subEdges = pairsV2
      .join(affIds.withColumnRenamed("doc_id", "ida"), Seq("ida"), "left_semi")
    // Edge-closure guard: correctness of the semi-join on `ida` alone
    // rests on the invariant that no subgraph edge has exactly one
    // affected endpoint (kept edges stay within one prev component; new
    // edges' endpoints are all touched). A future pair source violating
    // it would silently drop edges and mis-label clusters — fail loudly
    // instead. Cheap: a left-anti probe of the (small) affected
    // subgraph, short-circuited by isEmpty's limit(1).
    val stray = subEdges
      .join(affIds.withColumnRenamed("doc_id", "idb"), Seq("idb"), "left_anti")
    if (!stray.isEmpty)
      throw new IllegalStateException(
        "incremental curation: affected subgraph is not edge-closed " +
          "(an edge has exactly one affected endpoint) — the pair " +
          "source broke the closure invariant")
    // delta-sized affected subgraph — componentsAuto (identical
    // min-label closure) avoids O(diameter) distributed rounds here
    val subComp = Graphs.componentsAuto(subEdges, "ida", "idb")
      .withColumnRenamed("id", "doc_id")

    val curIds = cur.select("doc_id")
    val unaffected = prevArt.comp.join(curIds, "doc_id")
      .join(affIds, Seq("doc_id"), "left_anti")
    val affAssign = affIds.join(curIds, "doc_id")
      .join(subComp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
    val compV2 = unaffected.unionByName(affAssign)
    val ded = compV2
      .select(col("doc_id"),
        (col("doc_id") === col("component")).as("dedup_ok"))

    // 5. merge + verdict
    val verdicts = localV2.join(ded, "doc_id")
      .join(diff, "doc_id")
      .withColumn("keep", col("lang_ok") && col("quality_ok")
        && col("rep_ok") && col("decon_ok") && col("dedup_ok"))
      .select("doc_id", "lang_ok", "quality_ok", "rep_ok", "decon_ok",
        "dedup_ok", "keep", "status")
      .orderBy("doc_id")

    // 6. keyed deltas for a log-structured state commit (q162): changed
    //    docs are REPLACED by upserting their key, so only true removals
    //    delete; pair deletions need the actual edge keys (prev edges
    //    touching a gone/changed doc — two semi-joins, not an OR-join,
    //    which would plan as a nested-loop)
    val removedIds = diff.filter(col("status") === "removed").select("doc_id")
    val pairDels = prevArt.pairs
      .join(goneIds.withColumnRenamed("doc_id", "ida"), Seq("ida"), "left_semi")
      .unionByName(prevArt.pairs
        .join(goneIds.withColumnRenamed("doc_id", "idb"), Seq("idb"), "left_semi"))
      .select("ida", "idb").distinct()
    val deltas = ArtifactDeltas(
      removedIds = removedIds,
      verdictUps = localDelta,
      sigUps = deltaSigs,
      pairUps = newPairs,
      pairDels = pairDels,
      compUps = affAssign,
      statusDelta = diff.filter(col("status").isin("added", "changed"))
        .select("doc_id", "status"))

    IncrementalResult(verdicts,
      PrevArtifacts(localV2, sigsV2, pairsV2.select("ida", "idb"), compV2),
      deltas)
  }

  // ---- staged prev-run artifacts (the production tables) -----------------

  /** Materialize the prev run's artifact tables once per (fixture
    * signature, process) via the shared staged-dir protocol
    * ([[graft.streaming.FixtureStaging.stageOnce]]). */
  def stagedArtifacts(spark: SparkSession, dir: String): PrevArtifacts = {
    val root = graft.streaming.FixtureStaging
      .stageOnce("curprev", s"$dir/documents.parquet",
        "/tmp/graft-curprev") { d =>
        val art =
          artifactsOf(snapshotPrev(spark, dir), evalRegistry(spark, dir))
        art.verdicts.write.mode("overwrite").parquet(s"$d/verdicts")
        art.sigs.write.mode("overwrite").parquet(s"$d/sigs")
        art.pairs.write.mode("overwrite").parquet(s"$d/pairs")
        art.comp.write.mode("overwrite").parquet(s"$d/comp")
      }
    PrevArtifacts(
      verdicts = spark.read.parquet(s"$root/verdicts"),
      sigs = spark.read.parquet(s"$root/sigs"),
      pairs = spark.read.parquet(s"$root/pairs"),
      comp = spark.read.parquet(s"$root/comp"))
  }

  /** q157 entry: incremental re-verdict of the current snapshot against
    * the staged artifacts of the previous run. */
  def incrementalCuration(spark: SparkSession, dir: String): DataFrame =
    incrementalVerdicts(stagedArtifacts(spark, dir),
      snapshotPrev(spark, dir), snapshotCur(spark, dir),
      evalRegistry(spark, dir))
}
