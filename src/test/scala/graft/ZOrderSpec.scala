package graft

import org.apache.spark.sql.functions._

import graft.util.ZOrder

/** Morton key correctness: lossless interleave, Column/JVM mirror
  * equality, and the locality property q107's buckets rely on.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("spread/compact round-trip is lossless over the 16-bit domain") {
    val rnd = new scala.util.Random(3)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      assert(ZOrder.compactOf(ZOrder.spreadOf(x)) == x)
    }
    assert(ZOrder.spreadOf(0xFFFFL) == 0x55555555L)
  }

  test("morton interleaves: even bits from x, odd from y") {
    val rnd = new scala.util.Random(9)
    (1 to 500).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val z = ZOrder.mortonOf(x, y)
      assert(ZOrder.compactOf(z) == x)
      assert(ZOrder.compactOf(z >> 1) == y)
    }
  }

  test("Column form equals the JVM mirror on real keys") {
    val rows = Seq.tabulate(200)(i => (i.toLong * 131 % 65536,
      i.toLong * 977 % 65536))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.morton($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.mortonOf(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-buckets bound both dimensions (the data-skipping property)") {
    val rows = graft.operators.Relational
      .zorderProfile(spark, sf("sf0.001")).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      // a 2^16-wide z-range covers a 256x256 rectangle in (x, y):
      // each bucket's per-dimension spans must respect that bound
      assert(r.getLong(3) - r.getLong(2) <= 256, s"cust span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 256, s"day span too wide: $r")
    }
  }
}
