package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class StringMetricsSpec extends AnyFunSuite {
  import StringMetrics._

  test("jaro-winkler published vectors") {
    assert(math.abs(jaroWinkler("MARTHA", "MARHTA") - 0.9611111) < 1e-6)
    assert(math.abs(jaroWinkler("DIXON", "DICKSONX") - 0.8133333) < 1e-6)
    assert(math.abs(jaroWinkler("JELLYFISH", "SMELLYFISH") - 0.8962963) < 1e-6)
    assert(jaroWinkler("abc", "abc") == 1.0)
    assert(jaroWinkler("", "") == 1.0)
    assert(jaroWinkler("abc", "") == 0.0)
    assert(jaroWinkler("abc", "xyz") == 0.0)
  }

  test("jaro-winkler symmetry + range over random strings") {
    val rnd = new java.util.SplittableRandom(5)
    def randStr() = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    }
    for (_ <- 0 until 2000) {
      val (a, b) = (randStr(), randStr())
      val jw = jaroWinkler(a, b)
      assert(jw >= 0.0 && jw <= 1.0)
      assert(math.abs(jw - jaroWinkler(b, a)) < 1e-12)
    }
  }

  test("damerau-levenshtein (OSA) cases") {
    assert(damerauLevenshtein("ca", "ac") == 1)   // transposition
    assert(damerauLevenshtein("abcd", "abdc") == 1)
    assert(damerauLevenshtein("abc", "abc") == 0)
    assert(damerauLevenshtein("abc", "") == 3)
    assert(damerauLevenshtein("", "xy") == 2)
    assert(damerauLevenshtein("kitten", "sitting") == 3)
    assert(damerauLevenshtein("smith", "smiht") == 1)
    // OSA (not full DL): "ca"->"abc" is 3 in OSA, 2 in unrestricted DL
    assert(damerauLevenshtein("ca", "abc") == 3)
  }

  test("levenshtein agrees with DL when no transpositions") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("flaw", "lawn") == 2)
    val rnd = new java.util.SplittableRandom(9)
    def randStr() = (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 0 until 1000) {
      val (a, b) = (randStr(), randStr())
      assert(damerauLevenshtein(a, b) <= levenshtein(a, b))
    }
  }
}
