package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-generated 10× scaling fixture (the round-6 verdict's "measure
  * the scale claims" probe): N disjoint key-remapped copies of the
  * sf0.1 tables, written to a scratch dir for Spark-vs-Spark scaling
  * runs — no oracle involved, so nothing here touches correctness.
  *
  * Construction contract (what makes the probe measure PLAN scaling,
  * not artifact blowup):
  *   - every surrogate key offsets by copy × K with K divisible by
  *     2100 = lcm(6, 7, 25, 100) — the registry's id-arithmetic
  *     predicates (eval registry % 25, delta split % 6, tombstones
  *     % 7, query set % 100) keep their exact proportions;
  *   - foreign keys remap CONSISTENTLY (an order's lineitems follow it
  *     into the copy), so the relational graph is N disjoint replicas —
  *     exactly how TPC-H itself scales (more orders, same per-order
  *     shape);
  *   - document text for copy c > 0 suffixes every token with "_c<c>":
  *     copies share NO shingles, so near-dup structure replicates
  *     (pairs scale ×N) instead of exploding cross-copy (a one-token
  *     perturbation would leave Jaccard ≈ 1 and make every doc a
  *     10-way near-dup — that measures data pathology, not the plan).
  *     Vocabulary grows ×N — an upper bound vs Heaps' law, i.e. the
  *     HARD case for vocab-grain stages;
  *   - embeddings rotate by c positions: distinct vectors, same norms,
  *     same pairwise-cosine structure within a copy;
  *   - dimension tables (region, nation) copy once — dims don't scale;
  *   - events offset ids into the same time window (a 10× day, not a
  *     10-day window).
  *
  * Deliberately NOT scaled: IVF centroid count (vec_id < 16 keeps copy
  * 0's 16 centroids over a 10× corpus). Bucket sizes therefore grow
  * ×N and bucket-local pair work ×N² — the fixed-K regime every IVF
  * deployment avoids by scaling K ~ √n with the corpus. The probe
  * REPORTS that super-linearity with this named cause rather than
  * hiding it (SCALE.md).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1)
      else s"${System.getProperty("java.io.tmpdir")}/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.util.Sessions.withGraftDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // all divisible by 2100 — see the construction contract above
    val OffDoc = 10500000L
    val OffVec = 10500000L
    val OffOrder = 210000000L
    val OffCust = 10500000L
    val OffPart = 10500000L
    val OffSupp = 2100000L
    val OffEvent = 210000000L
    val OffUser = 10500000L

    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.sources.Tables.load(spark, src, t)
      val all = (0 until copies).map(c => f(base, c)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t -> ${copies}x")
    }

    // dims: copy once
    Seq("region", "nation").foreach { t =>
      graft.sources.Tables.load(spark, src, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t -> 1x (dimension)")
    }

    replicate("customer") { (d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * OffCust))
    }
    replicate("supplier") { (d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * OffSupp))
    }
    replicate("part") { (d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * OffPart))
    }
    replicate("orders") { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * OffOrder))
        .withColumn("o_custkey", col("o_custkey") + lit(c * OffCust))
    }
    replicate("lineitem") { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * OffOrder))
        .withColumn("l_partkey", col("l_partkey") + lit(c * OffPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * OffSupp))
    }
    replicate("events") { (d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * OffEvent))
        .withColumn("user_id", col("user_id") + lit(c * OffUser))
    }
    replicate("documents") { (d, c) =>
      val t =
        if (c == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_c$c"))), " ")
      d.withColumn("doc_id", col("doc_id") + lit(c * OffDoc))
        .withColumn("text", t)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (d, c) =>
      // rotate by c positions (c < 64); past a full rotation (c ≥ 64,
      // the 100× fixture) rotate by c-64 AND negate — cos(-x, x) = -1,
      // so late copies still share NO near-dup structure with their
      // rotation twins, norms and in-copy pairwise cosines unchanged
      // (cos(-x, -y) = cos(x, y))
      val r = c % 64
      val rot =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r))
      val e = if (c < 64) rot else transform(rot, v => -v)
      d.withColumn("vec_id", col("vec_id") + lit(c * OffVec))
        .withColumn("embedding", e)
    }
    spark.stop()
  }
}
