package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSim
import graft.operators.VectorOps

/** The native cosine expression must be BIT-identical to both the
  * typed kernel (cosOf) and the interpreted HOF fold — same
  * left-to-right double accumulation — and must run codegen'd.
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("bit-equal to cosOf and the HOF fold on real embeddings") {
    val dir = sf("sf0.001")
    val e = graft.sources.Tables.embeddings(spark, dir).limit(50)
    val pairs = e.select($"vec_id".as("ida"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("idb"), $"embedding".as("vb")))
      .filter($"ida" < $"idb")
    val both = pairs.select($"ida", $"idb",
        CosineSim.cosineSim($"va", $"vb").as("native"),
        VectorOps.cosine($"va", $"vb").as("hof"),
        $"va", $"vb")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val native = r.getDouble(2)
      val hof = r.getDouble(3)
      val kernel = VectorOps.cosOf(
        r.getSeq[Float](4).toArray, r.getSeq[Float](5).toArray)
      assert(java.lang.Double.doubleToLongBits(native)
        == java.lang.Double.doubleToLongBits(hof),
        s"native $native != hof $hof at (${r.getLong(0)},${r.getLong(1)})")
      assert(java.lang.Double.doubleToLongBits(native)
        == java.lang.Double.doubleToLongBits(kernel),
        s"native $native != kernel $kernel")
    }
  }

  test("codegen'd over a scan; SQL-registered; zero-norm gives NaN") {
    CosineSim.register(spark)
    val dir = sf("sf0.001")
    val df = graft.sources.Tables.embeddings(spark, dir)
      .select(CosineSim.cosineSim($"embedding", $"embedding").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_sim"), s"not codegen'd:\n$plan")
    // self-similarity is 1.0 up to float rounding
    val vals = df.as[Double].collect()
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-6))
    val viaSql = spark.sql(
      "SELECT cosine_sim(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>)," +
        " CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS s")
      .as[Double].head()
    assert(viaSql.isNaN)
  }
}
