package graft.expr

/** Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000; public
  * algorithm) — primary + alternate phonetic codes.
  *
  * Reference usage: `phonetics.dmetaphone(name)` produces the 2-tuple
  * compared with "array intersection size >= 1"
  * (`person_1/link_model_per.py:579-592,1160`). Engine exposes it as a
  * Catalyst expression returning `array<string>` (see [[Expressions]]).
  *
  * This is a from-scratch Scala implementation of the published algorithm
  * (not a port of the reference, which calls a library).
  */
object DoubleMetaphone {

  private val Vowels = "AEIOUY"

  def encode(input: String): Array[String] = encode(input, 4)

  def encode(input: String, maxLength: Int): Array[String] = {
    if (input == null) return null
    // keep Ç/Ñ and internal spaces: the published rules this body
    // implements depend on them ('Ç'→S, 'Ñ'→N, "VAN "/"VON "/"SAN "/
    // "IER " prefixes) — stripping to [A-Z] would make those branches
    // unreachable and mis-code accented and multi-word names
    val in = input.toUpperCase(java.util.Locale.ROOT)
      .replaceAll("[^A-ZÇÑ ]", "").replaceAll(" +", " ").trim
    if (in.isEmpty) return Array("", "")
    val st = new State(in, maxLength)
    st.run()
    Array(st.primary.toString, st.alternate.toString)
  }

  private final class State(val w: String, maxLen: Int) {
    val primary = new StringBuilder
    val alternate = new StringBuilder
    val len: Int = w.length
    var pos: Int = 0

    def ch(i: Int): Char = if (i < 0 || i >= len) 0 else w.charAt(i)
    def isVowel(i: Int): Boolean = i >= 0 && i < len && Vowels.indexOf(w.charAt(i)) >= 0
    def stringAt(start: Int, length: Int, pats: String*): Boolean = {
      if (start < 0 || start + length > len) return false
      val s = w.substring(start, start + length)
      pats.contains(s)
    }
    def add(p: String, a: String): Unit = { primary.append(p); alternate.append(a) }
    def add(both: String): Unit = add(both, both)
    def done: Boolean = primary.length >= maxLen && alternate.length >= maxLen

    def isSlavoGermanic: Boolean =
      w.contains("W") || w.contains("K") || w.contains("CZ") || w.contains("WITZ")

    def run(): Unit = {
      // skip silent first letters
      if (stringAt(0, 2, "GN", "KN", "PN", "WR", "PS")) pos = 1
      if (ch(0) == 'X') { add("S"); pos = 1 } // 'X' at start sounds like Z -> S

      while (pos < len && !done) step()

      if (primary.length > maxLen) primary.setLength(maxLen)
      if (alternate.length > maxLen) alternate.setLength(maxLen)
    }

    private def step(): Unit = {
      val c = ch(pos)
      c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (pos == 0) add("A")
          pos += 1
        case 'B' =>
          add("P"); pos += (if (ch(pos + 1) == 'B') 2 else 1)
        case 'Ç' => add("S"); pos += 1
        case 'C' => doC()
        case 'D' => doD()
        case 'F' => add("F"); pos += (if (ch(pos + 1) == 'F') 2 else 1)
        case 'G' => doG()
        case 'H' =>
          // keep H between vowels or at start before a vowel
          if ((pos == 0 || isVowel(pos - 1)) && isVowel(pos + 1)) { add("H"); pos += 2 }
          else pos += 1
        case 'J' => doJ()
        case 'K' => add("K"); pos += (if (ch(pos + 1) == 'K') 2 else 1)
        case 'L' => doL()
        case 'M' =>
          add("M")
          pos += (if (ch(pos + 1) == 'M' ||
            (stringAt(pos - 1, 3, "UMB") &&
              (pos + 1 == len - 1 || stringAt(pos + 2, 2, "ER")))) 2 else 1)
        case 'N' => add("N"); pos += (if (ch(pos + 1) == 'N') 2 else 1)
        case 'Ñ' => add("N"); pos += 1
        case 'P' =>
          if (ch(pos + 1) == 'H') { add("F"); pos += 2 }
          else { add("P"); pos += (if (ch(pos + 1) == 'P' || ch(pos + 1) == 'B') 2 else 1) }
        case 'Q' => add("K"); pos += (if (ch(pos + 1) == 'Q') 2 else 1)
        case 'R' => doR()
        case 'S' => doS()
        case 'T' => doT()
        case 'V' => add("F"); pos += (if (ch(pos + 1) == 'V') 2 else 1)
        case 'W' => doW()
        case 'X' =>
          if (!(pos == len - 1 &&
              (stringAt(pos - 3, 3, "IAU", "EAU") || stringAt(pos - 2, 2, "AU", "OU"))))
            add("KS")
          pos += (if (stringAt(pos + 1, 1, "C", "X")) 2 else 1)
        case 'Z' =>
          if (ch(pos + 1) == 'H') { add("J"); pos += 2 }
          else {
            if (stringAt(pos + 1, 2, "ZO", "ZI", "ZA") ||
                (isSlavoGermanic && pos > 0 && ch(pos - 1) != 'T')) add("S", "TS")
            else add("S")
            pos += (if (ch(pos + 1) == 'Z') 2 else 1)
          }
        case _ => pos += 1
      }
    }

    private def doC(): Unit = {
      // germanic -ACH-
      if (pos > 1 && !isVowel(pos - 2) && stringAt(pos - 1, 3, "ACH") &&
          ch(pos + 2) != 'I' &&
          (ch(pos + 2) != 'E' || stringAt(pos - 2, 6, "BACHER", "MACHER"))) {
        add("K"); pos += 2; return
      }
      if (pos == 0 && stringAt(0, 6, "CAESAR")) { add("S"); pos += 2; return }
      if (stringAt(pos, 4, "CHIA")) { add("K"); pos += 2; return }
      if (stringAt(pos, 2, "CH")) { doCH(); return }
      if (stringAt(pos, 2, "CZ") && !stringAt(pos - 2, 4, "WICZ")) {
        add("S", "X"); pos += 2; return
      }
      if (stringAt(pos + 1, 3, "CIA")) { add("X"); pos += 3; return }
      if (stringAt(pos, 2, "CC") && !(pos == 1 && ch(0) == 'M')) {
        if (stringAt(pos + 2, 1, "I", "E", "H") && !stringAt(pos + 2, 2, "HU")) {
          if ((pos == 1 && ch(pos - 1) == 'A') ||
              stringAt(pos - 1, 5, "UCCEE", "UCCES")) add("KS")
          else add("X")
          pos += 3
        } else { add("K"); pos += 2 }
        return
      }
      if (stringAt(pos, 2, "CK", "CG", "CQ")) { add("K"); pos += 2; return }
      if (stringAt(pos, 2, "CI", "CE", "CY")) {
        if (stringAt(pos, 3, "CIO", "CIE", "CIA")) add("S", "X") else add("S")
        pos += 2; return
      }
      add("K")
      if (stringAt(pos + 1, 2, " C", " Q", " G")) pos += 3
      else if (stringAt(pos + 1, 1, "C", "K", "Q") && !stringAt(pos + 1, 2, "CE", "CI")) pos += 2
      else pos += 1
    }

    private def doCH(): Unit = {
      if (pos > 0 && stringAt(pos, 4, "CHAE")) { add("K", "X"); pos += 2; return }
      // greek-ish CH -> K at word start
      if (pos == 0 &&
          (stringAt(pos + 1, 5, "HARAC", "HARIS") ||
            stringAt(pos + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
          !stringAt(0, 5, "CHORE")) { add("K"); pos += 2; return }
      if (stringAt(0, 4, "VAN ", "VON ") || stringAt(0, 3, "SCH") ||
          stringAt(pos - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
          stringAt(pos + 2, 1, "T", "S") ||
          ((pos == 0 || stringAt(pos - 1, 1, "A", "O", "U", "E")) &&
            (pos + 2 >= len || stringAt(pos + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W")))) {
        add("K"); pos += 2; return
      }
      if (pos > 0) {
        if (stringAt(0, 2, "MC")) add("K") else add("X", "K")
      } else add("X")
      pos += 2
    }

    private def doD(): Unit = {
      if (stringAt(pos, 2, "DG")) {
        if (stringAt(pos + 2, 1, "I", "E", "Y")) { add("J"); pos += 3 }
        else { add("TK"); pos += 2 }
        return
      }
      if (stringAt(pos, 2, "DT", "DD")) { add("T"); pos += 2; return }
      add("T"); pos += 1
    }

    private def doG(): Unit = {
      if (ch(pos + 1) == 'H') {
        if (pos > 0 && !isVowel(pos - 1)) { add("K"); pos += 2; return }
        if (pos == 0) {
          if (ch(pos + 2) == 'I') add("J") else add("K")
          pos += 2; return
        }
        // silent GH variants
        if ((pos > 1 && stringAt(pos - 2, 1, "B", "H", "D")) ||
            (pos > 2 && stringAt(pos - 3, 1, "B", "H", "D")) ||
            (pos > 3 && stringAt(pos - 4, 1, "B", "H"))) { pos += 2; return }
        if (pos > 2 && ch(pos - 1) == 'U' &&
            stringAt(pos - 3, 1, "C", "G", "L", "R", "T")) { add("F"); pos += 2; return }
        if (pos > 0 && ch(pos - 1) != 'I') { add("K"); pos += 2; return }
        pos += 2; return
      }
      if (ch(pos + 1) == 'N') {
        if (pos == 1 && isVowel(0) && !isSlavoGermanic) add("KN", "N")
        else if (!stringAt(pos + 2, 2, "EY") && ch(pos + 1) != 'Y' && !isSlavoGermanic)
          add("N", "KN")
        else add("KN")
        pos += 2; return
      }
      if (stringAt(pos + 1, 2, "LI") && !isSlavoGermanic) { add("KL", "L"); pos += 2; return }
      if (pos == 0 && (ch(pos + 1) == 'Y' ||
          stringAt(pos + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"))) {
        add("K", "J"); pos += 2; return
      }
      if ((stringAt(pos + 1, 2, "ER") || ch(pos + 1) == 'Y') &&
          !stringAt(0, 6, "DANGER", "RANGER", "MANGER") &&
          !stringAt(pos - 1, 1, "E", "I") &&
          !stringAt(pos - 1, 3, "RGY", "OGY")) {
        add("K", "J"); pos += 2; return
      }
      if (stringAt(pos + 1, 1, "E", "I", "Y") || stringAt(pos - 1, 4, "AGGI", "OGGI")) {
        if (stringAt(0, 4, "VAN ", "VON ") || stringAt(0, 3, "SCH") ||
            stringAt(pos + 1, 2, "ET")) add("K")
        else if (stringAt(pos + 1, 4, "IER ") || pos + 4 == len && stringAt(pos + 1, 3, "IER"))
          add("J")
        else add("J", "K")
        pos += 2; return
      }
      add("K"); pos += (if (ch(pos + 1) == 'G') 2 else 1)
    }

    private def doJ(): Unit = {
      if (stringAt(pos, 4, "JOSE") || stringAt(0, 4, "SAN ")) {
        if ((pos == 0 && ch(pos + 4) == ' ') || len == 4 || stringAt(0, 4, "SAN "))
          add("H")
        else add("J", "H")
        pos += 1; return
      }
      if (pos == 0 && !stringAt(pos, 4, "JOSE")) add("J", "A")
      else if (isVowel(pos - 1) && !isSlavoGermanic &&
          (ch(pos + 1) == 'A' || ch(pos + 1) == 'O')) add("J", "H")
      else if (pos == len - 1) add("J", "")
      else if (!stringAt(pos + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") &&
          !stringAt(pos - 1, 1, "S", "K", "L")) add("J")
      pos += (if (ch(pos + 1) == 'J') 2 else 1)
    }

    private def doL(): Unit = {
      if (ch(pos + 1) == 'L') {
        // spanish-ish LL
        if ((pos == len - 3 && stringAt(pos - 1, 4, "ILLO", "ILLA", "ALLE")) ||
            ((stringAt(len - 2, 2, "AS", "OS") || stringAt(len - 1, 1, "A", "O")) &&
              stringAt(pos - 1, 4, "ALLE"))) {
          add("L", ""); pos += 2; return
        }
        pos += 2
      } else pos += 1
      add("L")
    }

    private def doR(): Unit = {
      if (pos == len - 1 && !isSlavoGermanic &&
          stringAt(pos - 2, 2, "IE") && !stringAt(pos - 4, 2, "ME", "MA"))
        add("", "R")
      else add("R")
      pos += (if (ch(pos + 1) == 'R') 2 else 1)
    }

    private def doS(): Unit = {
      if (stringAt(pos - 1, 3, "ISL", "YSL")) { pos += 1; return } // silent (isle)
      if (pos == 0 && stringAt(pos, 5, "SUGAR")) { add("X", "S"); pos += 1; return }
      if (stringAt(pos, 2, "SH")) {
        if (stringAt(pos + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ")) add("S") else add("X")
        pos += 2; return
      }
      if (stringAt(pos, 3, "SIO", "SIA") || stringAt(pos, 4, "SIAN")) {
        if (!isSlavoGermanic) add("S", "X") else add("S")
        pos += 3; return
      }
      if ((pos == 0 && stringAt(pos + 1, 1, "M", "N", "L", "W")) ||
          stringAt(pos + 1, 1, "Z")) {
        add("S", "X")
        pos += (if (stringAt(pos + 1, 1, "Z")) 2 else 1); return
      }
      if (stringAt(pos, 2, "SC")) {
        if (ch(pos + 2) == 'H') {
          if (stringAt(pos + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
            if (stringAt(pos + 3, 2, "ER", "EN")) add("X", "SK") else add("SK")
          } else {
            if (pos == 0 && !isVowel(3) && ch(3) != 'W') add("X", "S") else add("X")
          }
          pos += 3; return
        }
        if (stringAt(pos + 2, 1, "I", "E", "Y")) { add("S"); pos += 3; return }
        add("SK"); pos += 3; return
      }
      if (pos == len - 1 && stringAt(pos - 2, 2, "AI", "OI")) add("", "S")
      else add("S")
      pos += (if (stringAt(pos + 1, 1, "S", "Z")) 2 else 1)
    }

    private def doT(): Unit = {
      if (stringAt(pos, 4, "TION")) { add("X"); pos += 3; return }
      if (stringAt(pos, 3, "TIA", "TCH")) { add("X"); pos += 3; return }
      if (stringAt(pos, 2, "TH") || stringAt(pos, 3, "TTH")) {
        if (stringAt(pos + 2, 2, "OM", "AM") ||
            stringAt(0, 4, "VAN ", "VON ") || stringAt(0, 3, "SCH")) add("T")
        else add("0", "T")
        pos += 2; return
      }
      add("T"); pos += (if (stringAt(pos + 1, 1, "T", "D")) 2 else 1)
    }

    private def doW(): Unit = {
      if (stringAt(pos, 2, "WR")) { add("R"); pos += 2; return }
      if (pos == 0 && (isVowel(pos + 1) || stringAt(pos, 2, "WH"))) {
        if (isVowel(pos + 1)) add("A", "F") else add("A")
        pos += 1; return
      }
      if ((pos == len - 1 && isVowel(pos - 1)) ||
          stringAt(pos - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
          stringAt(0, 3, "SCH")) {
        add("", "F"); pos += 1; return
      }
      if (stringAt(pos, 4, "WICZ", "WITZ")) { add("TS", "FX"); pos += 4; return }
      pos += 1 // else silent
    }
  }
}
