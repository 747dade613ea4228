package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional sort key
  * behind data-skipping layouts (Delta/Iceberg Z-ORDER BY): interleave
  * the bits of two dimensions so that rows close in BOTH dimensions
  * land close in the one-dimensional sort, letting min/max file stats
  * prune on either predicate dimension.
  *
  * The interleave is the classic spread-bits ladder (mask-and-shift,
  * five exact integer ops per dimension) — identical arithmetic in any
  * engine, so z-keys are oracle-checkable like everything else. 16 bits
  * per dimension → 32-bit keys (enough for file-grain clustering; the
  * ladder extends to 32/64 mechanically).
  */
object ZOrder {

  private val masks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of x so bit i lands at position 2i. */
  def spread(x: Column): Column =
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (c, (sh, m)) =>
      c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions (x even bits, y odd). */
  def morton(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** JVM mirror for specs. */
  def spreadOf(x0: Long): Long =
    masks.foldLeft(x0 & 0xFFFFL) { case (c, (sh, m)) => (c | (c << sh)) & m }

  def mortonOf(x: Long, y: Long): Long = spreadOf(x) | (spreadOf(y) << 1)

  /** Inverse of [[spreadOf]] (compact even bits) — proves losslessness. */
  def compactOf(z0: Long): Long = {
    var z = z0 & 0x55555555L
    Seq((1, 0x33333333L), (2, 0x0F0F0F0FL), (4, 0x00FF00FFL), (8, 0x0000FFFFL))
      .foreach { case (sh, m) => z = (z | (z >> sh)) & m }
    z
  }

  /** DuckDB-side mirror: same ladder as [[spread]]/[[morton]], emitted
    * as SQL text over a column expression. */
  object Sql {
    def spread(x: String): String =
      masks.foldLeft(s"($x & 65535)") { case (c, (sh, m)) =>
        s"(($c | ($c << $sh)) & $m)"
      }
    def morton(x: String, y: String): String =
      s"(${spread(x)} | (${spread(y)} << 1))"
  }
}
