package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.functions.SortedIntersectCount.sortedIntersectCount

/** The codegen'd merge-walk overlap kernel: equality with
  * size(array_intersect) on random SORTED set pairs (strings and
  * longs), parity between whole-stage-codegen and interpreted
  * evaluation, null propagation, and the SQL registration.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def drive[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = rng.Seed(7L)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next; v
    }
  }

  private val pairGen: Gen[(Seq[Int], Seq[Int])] = for {
    v <- Gen.choose(3, 20)
    a <- Gen.listOf(Gen.choose(0, v))
    b <- Gen.listOf(Gen.choose(0, v))
  } yield (a.distinct.sorted, b.distinct.sorted)

  test("≡ size(array_intersect) on random sorted sets, both types") {
    val rows = drive(pairGen, 60).zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a.map(x => f"t$x%03d").toArray, a.map(_.toLong).toArray,
        b.map(x => f"t$x%03d").toArray, b.map(_.toLong).toArray)
    }
    val df = rows.toDF("id", "sa", "la", "sb", "lb").cache()
    val bad = df.select($"id",
        sortedIntersectCount($"sa", $"sb").as("ks"),
        size(array_intersect($"sa", $"sb")).as("rs"),
        sortedIntersectCount($"la", $"lb").as("kl"),
        size(array_intersect($"la", $"lb")).as("rl"))
      .filter($"ks" =!= $"rs" || $"kl" =!= $"rl")
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("codegen ≡ interpreted; nulls propagate; SQL name resolves") {
    val df = Seq((Array("a", "b", "c"), Array("b", "c", "d")))
      .toDF("a", "b")
    def run(): Int =
      df.select(sortedIntersectCount($"a", $"b")).as[Int].head()
    val before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val cg = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(cg == 2 && interp == 2)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", before)
    val withNull = Seq((Some(Array("a")), Option.empty[Array[String]]))
      .toDF("a", "b")
      .select(sortedIntersectCount($"a", $"b").as("c"))
    assert(withNull.filter($"c".isNull).count() == 1)
    // session-extension registration (the Verify/Bench session path)
    graft.util.Sessions // touch: ensure object init
    org.apache.spark.sql.graftbridge.Bridge.registerTemp(spark,
      "sorted_intersect_count",
      exprs => graft.functions.SortedIntersectCount(exprs(0), exprs(1)))
    df.createOrReplaceTempView("sic_t")
    assert(spark.sql(
      "SELECT sorted_intersect_count(a, b) FROM sic_t")
      .as[Int].head() == 2)
    // null ELEMENTS (reachable via the session-wide SQL registration)
    // are defined to never intersect — not read as garbage
    def nullElems(): Int = spark.sql(
      "SELECT sorted_intersect_count(array(NULL, 'a', 'b'), " +
        "array('b', 'c'))").first().getInt(0)
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(nullElems() == 1)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(nullElems() == 1)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", before)
  }
}
