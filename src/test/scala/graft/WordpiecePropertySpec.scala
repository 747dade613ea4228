package graft

import org.scalacheck.{Gen, rng}

import graft.operators.TextOps

/** Property tests for the greedy subword segmenter (q183) — the loop
  * the unrolled SQL oracle replays must satisfy, for ARBITRARY words
  * over the vocabulary alphabet (not just the fixture's 31):
  *  - progress/termination: piece count is bounded by word length,
  *  - a word built purely from single-char vocab letters never UNKs,
  *  - any word containing a character with no vocab piece starting a
  *    match at its position segments to [UNK] exactly when greedy
  *    matching STALLS there (q-words stall at position 0),
  *  - greedy re-segmentation of a concatenation never produces more
  *    pieces than the sum of the parts' segmentations + 1 would…
  *    (dropped: greedy is famously non-compositional; instead we pin
  *    determinism: same word → same result, and UNK ⇒ exactly one
  *    piece by the WordPiece whole-word-UNK contract).
  * ScalaCheck generators driven directly with a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class WordpiecePropertySpec extends SparkSpec {

  // letters that exist as single-char fallback pieces in WpVocab
  private val covered: Seq[Char] =
    TextOps.WpVocab.filter(_.length == 1).map(_.head)
  private val coveredWordGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(covered))
  } yield cs.mkString

  private val anyWordGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf('a' to 'z'))
  } yield cs.mkString

  private def drive[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = rng.Seed(42L)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  test("covered-alphabet words always segment without [UNK], " +
      "with bounded piece counts") {
    drive(coveredWordGen, 200).foreach { w =>
      val (np, nu) = TextOps.wordpieceSegment(w)
      assert(nu == 0, s"'$w' unexpectedly UNK'd")
      assert(np >= 1 && np <= w.length, s"'$w' gave $np pieces")
    }
  }

  test("UNK words produce exactly one piece; segmentation is " +
      "deterministic") {
    drive(anyWordGen, 200).foreach { w =>
      val r1 = TextOps.wordpieceSegment(w)
      val r2 = TextOps.wordpieceSegment(w)
      assert(r1 == r2, s"'$w' nondeterministic")
      val (np, nu) = r1
      assert(nu == 0 || (nu == 1 && np >= 1 && np <= w.length),
        s"'$w' gave ($np, $nu) — a stall emits exactly one [UNK] " +
          "consuming the rest")
      if (nu == 1) {
        // an UNK word really does stall: at SOME position no vocab
        // piece matches (replay the greedy walk to find it)
        var pos = 0; var stalled = false
        while (!stalled && pos < w.length) {
          val best = TextOps.WpVocab
            .filter(p => w.startsWith(p, pos))
            .sortBy(p => -p.length).headOption
          best match {
            case None => stalled = true
            case Some(p) => pos += p.length
          }
        }
        assert(stalled, s"'$w' UNK'd but never stalls")
      }
    }
  }
}
