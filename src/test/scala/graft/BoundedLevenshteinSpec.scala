package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedLevenshtein

/** The banded-Levenshtein kernel against the textbook full DP matrix:
  * exact when ≤ k, exactly k+1 when beyond, across randomized pairs,
  * adversarial shapes, and every k in 0..4. */
class BoundedLevenshteinSpec extends AnyFunSuite {

  private def full(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    val d = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(n)(m)
  }

  private def banded(a: String, b: String, k: Int): Int =
    BoundedLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("banded == min(full, k+1) on randomized pairs for k in 0..4") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def word(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val a = word(rnd.nextInt(14))
      val b = if (rnd.nextBoolean()) word(rnd.nextInt(14))
        else { // near-miss: mutate a
          val sb = new StringBuilder(a)
          if (sb.nonEmpty) sb.setCharAt(rnd.nextInt(sb.length),
            alpha(rnd.nextInt(alpha.length)))
          sb.toString
        }
      val f = full(a, b)
      for (k <- 0 to 4)
        assert(banded(a, b, k) == math.min(f, k + 1),
          s"a=$a b=$b k=$k full=$f")
    }
  }

  test("adversarial shapes: empties, equal, prefix, disjoint, swaps") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 3), ("abc", "", 3), ("abc", "abc", 0),
      ("abc", "abcd", 1), ("abcd", "abc", 1), ("abc", "axc", 1),
      ("abc", "acb", 2), ("kitten", "sitting", 3),
      ("aaaaaa", "bbbbbb", 6), ("ab", "ba", 2))
    for ((a, b, f) <- cases; k <- 0 to 4) {
      assert(full(a, b) == f, s"sanity $a/$b")
      assert(banded(a, b, k) == math.min(f, k + 1), s"a=$a b=$b k=$k")
    }
  }

  /** Full matrix over CODE POINTS (what Spark's builtin levenshtein
    * counts) — the reference for the non-BMP cases where UTF-16
    * char-wise counting would differ (surrogate pairs count 2). */
  private def fullCp(a: String, b: String): Int = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val n = ca.length; val m = cb.length
    val d = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (ca(i - 1) == cb(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(n)(m)
  }

  test("code-point semantics: surrogate pairs count as ONE edit, " +
      "matching Spark's builtin levenshtein for non-BMP input") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 4-byte UTF-8
    val cases = Seq(
      (s"a${clef}b", "ab"),     // one deletion, not two
      (s"a${clef}b", s"a${clef}b"),
      (s"${clef}${clef}", s"${clef}x"),
      ("héllo", "hello"),       // 2-byte char: one substitution
      (s"${clef}", ""), ("", s"${clef}"),
      (s"x${clef}", s"${clef}x"))
    for ((a, b) <- cases; k <- 0 to 4) {
      val f = fullCp(a, b)
      assert(banded(a, b, k) == math.min(f, k + 1),
        s"a=$a b=$b k=$k fullCp=$f")
    }
    // the UTF-16 char-wise count WOULD be different for the clef pair —
    // assert the kernel did not regress to it
    assert(banded(s"a${clef}b", "ab", 4) == 1)
    assert(full(s"a${clef}b", "ab") == 2) // chars: the wrong count
  }

  test("kernel micro-cost: the band touches O(k*min) cells, the full " +
      "matrix O(n*m) — measured on long strings (informational)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh"
    val pairs = (1 to 200).map { _ =>
      val a = (0 until 400).map(_ => alpha(rnd.nextInt(8))).mkString
      val b = (0 until 400).map(_ => alpha(rnd.nextInt(8))).mkString
      (a, b)
    }
    // warm both
    pairs.take(20).foreach { case (a, b) => full(a, b); banded(a, b, 2) }
    val t0 = System.nanoTime()
    pairs.foreach { case (a, b) => full(a, b) }
    val tFull = System.nanoTime() - t0
    val t1 = System.nanoTime()
    pairs.foreach { case (a, b) => banded(a, b, 2) }
    val tBand = System.nanoTime() - t1
    info(f"full=${tFull / 1e6}%.1f ms banded=${tBand / 1e6}%.1f ms " +
      f"speedup=${tFull.toDouble / tBand}%.0fx (400-char pairs, k=2)")
    // the structural claim, with a generous margin for JIT noise
    assert(tBand * 5 < tFull,
      s"banded $tBand ns not clearly cheaper than full $tFull ns")
  }
}
