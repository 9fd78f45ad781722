package graft.expr

/** String similarity kernels used by the comparison DSL (SURVEY §2.11):
  * Jaro–Winkler (reference gamma level `jaro_winkler >= 0.9`,
  * `person_1/link_model_per.py:616-627`) and Damerau–Levenshtein
  * (`DamerauLevenshteinAtThresholds(suburb_code, 2)`,
  * `person_1/link_model_per.py:642-644`).
  *
  * Static methods so Catalyst codegen can call them directly
  * (see [[Expressions]] doGenCode).
  */
object StringMetrics {

  /** Jaro similarity in [0,1]. */
  def jaro(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val matchDist = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(n2 - 1, i + matchDist)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2.0
    (matches.toDouble / n1 + matches.toDouble / n2 + (matches - t) / matches) / 3.0
  }

  /** Jaro–Winkler with standard scaling p=0.1, max prefix 4. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    var prefix = 0
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Damerau–Levenshtein (optimal string alignment variant — adjacent
    * transposition costs 1, matching Splink's damerau_levenshtein). */
  def damerauLevenshtein(s1: String, s2: String): Int = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0) return n2
    if (n2 == 0) return n1
    var prev2: Array[Int] = null
    var prev = Array.tabulate(n2 + 1)(identity)
    var cur = new Array[Int](n2 + 1)
    var i = 1
    while (i <= n1) {
      cur(0) = i
      var j = 1
      while (j <= n2) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 &&
            s1.charAt(i - 1) == s2.charAt(j - 2) &&
            s1.charAt(i - 2) == s2.charAt(j - 1)) {
          d = math.min(d, prev2(j - 2) + 1)
        }
        cur(j) = d
        j += 1
      }
      val tmp = prev2
      prev2 = prev
      prev = cur
      cur = if (tmp == null) new Array[Int](n2 + 1) else tmp
      i += 1
    }
    prev(n2)
  }

  /** Plain Levenshtein (built-in exists in Spark; kept for the oracle-side
    * parity tests of the DL variant). */
  def levenshtein(s1: String, s2: String): Int = {
    val n2 = s2.length
    var prev = Array.tabulate(n2 + 1)(identity)
    var cur = new Array[Int](n2 + 1)
    var i = 1
    while (i <= s1.length) {
      cur(0) = i
      var j = 1
      while (j <= n2) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n2)
  }
}
