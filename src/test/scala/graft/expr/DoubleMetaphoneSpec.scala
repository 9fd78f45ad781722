package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class DoubleMetaphoneSpec extends AnyFunSuite {
  private def dm(s: String): (String, String) = {
    val r = DoubleMetaphone.encode(s)
    (r(0), r(1))
  }

  test("well-known primary/alternate pairs") {
    assert(dm("SMITH") == ("SM0", "XMT"))
    assert(dm("SCHMIDT") == ("XMT", "SMT"))
    assert(dm("robert") == ("RPRT", "RPRT"))
    assert(dm("rupert") == ("RPRT", "RPRT"))
    assert(dm("peter") == ("PTR", "PTR"))
    assert(dm("thomas") == ("TMS", "TMS"))
    assert(dm("katherine")._1 == "K0RN")
    assert(dm("katherine")._2 == "KTRN")
  }

  test("the reference's array-intersection semantics: similar names overlap") {
    // ≙ "Array intersection size >= 1" gamma level
    // (person_1/link_model_per.py:1160)
    def overlap(a: String, b: String): Boolean = {
      val (p1, a1) = dm(a); val (p2, a2) = dm(b)
      Set(p1, a1).intersect(Set(p2, a2)).nonEmpty
    }
    assert(overlap("smith", "smyth"))
    assert(overlap("catherine", "katherine"))
    assert(overlap("jon", "john"))
    assert(!overlap("smith", "jones"))
  }

  test("null-safety, casing, non-letters") {
    assert(DoubleMetaphone.encode(null) == null)
    assert(dm("o'brien") == dm("OBRIEN"))
    assert(dm("smith") == dm("SMITH"))
    assert(dm("") == ("", ""))
    assert(dm("123") == ("", ""))
  }

  test("accented letters and multi-word rules are reachable, not stripped") {
    assert(dm("garçon")._1 == "KRSN")           // Ç → S, not deleted
    assert(dm("muñoz")._1 == dm("munoz")._1)    // Ñ → N
    assert(dm("van gogh")._1.startsWith("FN"))  // "VAN " prefix rule fires
    assert(dm("san jose")._1 == "SNHS")         // "SAN " keeps the Spanish J→H
  }

  test("deterministic") {
    for (n <- Seq("washington", "wheeler", "ghislane", "xavier", "jose", "cabrillo"))
      assert(dm(n) == dm(n))
  }
}
