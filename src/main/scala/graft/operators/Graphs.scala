package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph operators for dedup-cluster resolution.
  *
  * Near-duplicate detection (TextOps.minhashNearDups) emits PAIRS, but a
  * training-data pipeline needs CLUSTERS: if A≈B and B≈C, then {A,B,C}
  * must keep exactly one canonical document even though (A,C) was never
  * emitted as a pair. That closure is connected components over the
  * near-dup graph — the step every production dedup pipeline runs between
  * LSH and document selection.
  *
  * Spark-first design: min-label propagation over DataFrames. Each round
  * every vertex takes the minimum component label among itself and its
  * neighbors; a fixpoint is reached after O(graph diameter) rounds, and
  * near-dup clusters have tiny diameters by construction. Per round the
  * only shuffle is one join + one groupBy on vertex id, and
  * `localCheckpoint()` truncates the growing lineage so round N's plan
  * does not replay rounds 1..N-1 (the standard Spark iterative-algorithm
  * discipline; GraphX does the same internally). At 100 TB the same loop
  * runs with `checkpoint()` to the cluster's reliable store and the
  * large-star/small-star variant bounds the round count on high-diameter
  * graphs; the dataflow shape is unchanged.
  */
object Graphs {

  /** Connected components of an undirected edge list: returns
    * (id, component) with component = min vertex id reachable.
    * Only vertices that appear in at least one edge are returned.
    */
  def components(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst"))
    // materialize the (possibly expensive) edge pipeline once; every
    // round re-reads the checkpointed blocks, not the upstream plan
    val bidir = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = bidir.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = bidir
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val next = labels
        .join(nbrMin.withColumnRenamed("nbr_comp", "nc"), Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.filter(col("comp") < col("old")).count()
      labels = next.select("id", "comp")
    }
    labels
  }

  /** Dedup-cluster assignment over the MinHash near-duplicate graph:
    * every document labeled with its cluster representative (min doc_id
    * in the connected component; singletons are their own cluster), the
    * cluster size, and the keep/drop verdict. The oracle recomputes the
    * same closure with a recursive CTE — small-diameter clusters keep
    * the recursion shallow in DuckDB exactly as they keep the round
    * count low here.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.minhashNearDups(spark, dir).select("ida", "idb")
    val comp = components(pairs, "ida", "idb")
      .withColumnRenamed("id", "doc_id")
    val out = Tables.documents(spark, dir).select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
    out
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("doc_id") === col("component"))
      .orderBy("doc_id")
  }
}
