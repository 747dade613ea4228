package graft.util

import org.apache.spark.sql.SparkSession

/** The session configs EVERY graft entry point must share — one
  * definition so a new entry point (or a new required config) cannot
  * silently miss a builder. This round's fixture change needed the NTZ
  * flag in seven builders; the bucketed-index work needed the
  * co-partition flag in five — each a grep-and-hope edit before this.
  */
object Sessions {

  /** Apply the shared graft defaults; callers keep their own master,
    * parallelism, warehouse and app-specific configs. */
  def withGraftDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    // the driver's testdata has shipped BOTH ts encodings across
    // generations: ns-annotated INT64 (read as LONG under nanosAsLong)
    // and untagged µs INT64 (would infer TIMESTAMP_NTZ — disabled so it
    // reads as session-tz TIMESTAMP, matching the DuckDB oracle)
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bucketed joins whose equi-keys EXTEND the bucket key (e.g. the
    // IVF index self-join on (cid, _sub)) stay exchange-free: children
    // co-partitioned on a subset of the join keys is exactly what a
    // bucketed layout provides (IvfIndexSpec pins the plan)
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .config("spark.ui.enabled", "false")
}
