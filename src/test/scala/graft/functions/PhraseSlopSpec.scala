package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PhraseSlopSpec extends AnyFunSuite {

  private def slop(q: String, d: String): Option[Int] =
    PhraseSlop.computeSlopText(q, d)

  test("exact in-order adjacent phrase needs slop 0") {
    assert(slop("quick brown fox", "the quick brown fox jumps") == Some(0))
  }

  test("one inserted filler costs 1; two cost 2") {
    assert(slop("quick fox", "quick brown fox") == Some(1))
    assert(slop("quick fox", "quick very brown fox") == Some(2))
  }

  test("adjacent transposition costs 2 (tantivy move budget)") {
    assert(slop("brown quick", "quick brown fox") == Some(2))
  }

  test("missing term means no slop can match") {
    assert(slop("quick zebra", "quick brown fox").isEmpty)
  }

  test("empty query matches with slop 0") {
    assert(PhraseSlop.computeSlop(Nil, Seq("a", "b")) == Some(0))
  }

  test("picks the best of repeated occurrences") {
    // "a ... b" far apart early, adjacent later: min is the later pair
    assert(slop("a b", "a x x x b a b") == Some(0))
  }

  test("duplicate query terms need distinct positions") {
    assert(slop("a a", "x a y a") == Some(1)) // a@1,a@3 → gap of 1 filler
    assert(slop("a a", "a z a") == Some(1))
  }

  test("matches brute-force smallest-range on random inputs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    def brute(q: Seq[String], d: Seq[String]): Option[Int] = {
      if (q.isEmpty) return Some(0)
      val maxQ = q.length - 1
      val pos = d.zipWithIndex.groupMap(_._1)(_._2)
      val lists = q.zipWithIndex.map { case (t, i) =>
        pos.getOrElse(t, return None).map(_.toLong + (maxQ - i))
      }
      def assignments(ls: Seq[Seq[Long]]): Seq[Seq[Long]] = ls match {
        case Seq() => Seq(Seq())
        case h +: t => for { x <- h; rest <- assignments(t) } yield x +: rest
      }
      Some(assignments(lists).map(a => (a.max - a.min).toInt).min)
    }
    for (_ <- 1 to 300) {
      val d = Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
      val q = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length)))
      assert(PhraseSlop.computeSlop(q, d) == brute(q, d),
        s"query=$q data=$d")
    }
  }
}
