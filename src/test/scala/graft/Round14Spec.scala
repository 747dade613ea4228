package graft

import org.apache.spark.sql.functions._

import graft.operators.Features

/** Round-9 additions: in-engine multinomial naive Bayes distillation
  * (q329). Invariants independent of the oracle gate: the confusion
  * grid is a partition of the corpus (dense 2×2, counts sum to n),
  * the student must beat the majority-class baseline (a generative
  * model over the full vocabulary sees strictly more signal than a
  * constant), and the reported accuracy equals the diagonal mass.
  */
class Round14Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q329: dense 2x2 grid partitions the corpus; accuracy is the " +
      "diagonal mass; fractions sum to 1") {
    val rows = Features.naiveBayesDistill(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    val n = rows.map(_.getLong(2)).sum
    val nd0 = rows(0).getAs[Long]("nd0")
    val nd1 = rows(0).getAs[Long]("nd1")
    assert(n == nd0 + nd1)
    val diag = rows.filter(r => r.getInt(0) == r.getInt(1))
      .map(_.getLong(2)).sum
    val acc = rows(0).getAs[Double]("train_acc")
    assert(math.abs(acc - diag.toDouble / n) < 1e-6)
    // fractions sum to 1 within the 6-dp portable rounding
    assert(math.abs(rows.map(_.getAs[Double]("frac")).sum - 1.0) < 4e-6)
  }

  test("q329: on a corpus whose classes have disjoint vocabularies " +
      "the NB student reproduces the teacher exactly") {
    import spark.implicits._
    // class 1: all-distinct tokens (TTR 1.0 > 0.55); class 0: one token
    // repeated (TTR 1/8 < 0.55). Vocabularies are disjoint, so the
    // generative model must separate the classes perfectly.
    val hi = (0 until 20).map(i =>
      (i.toLong, (0 until 8).map(j => s"u${i}_$j").mkString(" ")))
    val lo = (20 until 50).map(i =>
      (i.toLong, Seq.fill(8)(s"r$i").mkString(" ")))
    val corpus = (hi ++ lo).toDF("doc_id", "text")
    val rows = Features.naiveBayesDistillOn(spark, corpus).collect()
    val acc = rows(0).getAs[Double]("train_acc")
    assert(acc == 1.0, s"expected perfect separation, got $acc")
    assert(rows(0).getAs[Long]("nd1") == 20L)
    assert(rows(0).getAs[Long]("nd0") == 30L)
    // off-diagonal cells are present (dense grid) and empty
    assert(rows.filter(r => r.getInt(0) != r.getInt(1))
      .forall(_.getLong(2) == 0L))
  }
}
