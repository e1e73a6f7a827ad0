package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Static text-analysis helpers behind the analyzer Catalyst expressions
  * ([[AnalyzerExpressions]]) — called from generated code, so every
  * method is a pure (String in, String/Array out) function with no
  * captured state.
  *
  * Implements the two analysis pieces of the reference's ES mappings that
  * plain column functions can't express:
  *
  *  - [[porterStem]] — the "english" stemmer of
  *    `conf/mappings/english_mapping.json:17-19` (ES `stemmer:
  *    language=english` = the Porter2 / Snowball English algorithm,
  *    implemented here from the published algorithm description).
  *  - [[cjkAnalyze]] — the `cjk` analyzer chain of
  *    `conf/mappings/cjk_mapping.json:47-56` (cjk_width fold → lowercase
  *    → CJK bigrams): CJK runs become overlapping character bigrams, a
  *    lone CJK char stays a unigram, non-CJK runs tokenize as words.
  */
object TextAnalysis {

  // ---- Porter2 (Snowball English) ----------------------------------------

  // NOTE: 'Y' (the consonant-y mark) is deliberately NOT a vowel — all
  // region / syllable math runs over the marked word.
  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val LiEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  private val Exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariant forms
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** R1 start index; special-cased prefixes per the algorithm. */
  private def r1Of(w: String): Int = {
    if (w.startsWith("gener")) return 5
    if (w.startsWith("commun")) return 6
    if (w.startsWith("arsen")) return 5
    var i = 0
    while (i < w.length && !isVowel(w(i))) i += 1 // to first vowel
    while (i < w.length && isVowel(w(i))) i += 1  // through the vowel run
    if (i < w.length) i + 1 else w.length
  }

  private def regionFrom(w: String, start: Int): Int = {
    var i = start
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Ends in a short syllable: non-vowel + vowel + non-vowel(≠ w,x,Y), or
    * a vowel + non-vowel at the start of the word. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w(0)) && !isVowel(w(1))
    else if (n >= 3) {
      val c = w(n - 1); val v = w(n - 2); val p = w(n - 3)
      !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' && isVowel(v) && !isVowel(p)
    } else false
  }

  private def containsVowel(w: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (isVowel(w(i))) return true; i += 1 }
    false
  }

  /** Porter2 / Snowball English stem of a single lowercase token. Tokens
    * shorter than 3 chars, or containing characters outside [a-z'],
    * return unchanged (stemming is defined on English letter strings). */
  def porterStem(word0: String): String = {
    if (word0 == null) return null
    var w = word0
    if (w.length <= 2) return w
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if ((c < 'a' || c > 'z') && c != '\'' && c != '’') return w
      i += 1
    }
    w = w.replace('’', '\'')
    // step 0: strip leading apostrophe, then longest of '  's  's'
    if (w.startsWith("'")) w = w.substring(1)
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)
    if (w.length <= 2) return w
    Exceptions1.get(w) match { case Some(r) => return r; case None => () }

    // mark consonant-y as Y: y at the start, or y after a vowel
    val chars = w.toCharArray
    if (chars(0) == 'y') chars(0) = 'Y'
    i = 1
    while (i < chars.length) {
      if (chars(i) == 'y' && isVowel(chars(i - 1))) chars(i) = 'Y'
      i += 1
    }
    w = new String(chars)

    var r1 = r1Of(w)
    var r2 = regionFrom(w, r1)
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("ss") || w.endsWith("us")) ()
    else if (w.endsWith("s") && containsVowel(w, 0, w.length - 2))
      w = w.dropRight(1)

    if (Exceptions2.contains(w)) return w.replace('Y', 'y')

    // step 1b
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
    s1b.find(w.endsWith) match {
      case Some(sfx @ ("eed" | "eedly")) =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + "ee"
      case Some(sfx) =>
        if (containsVowel(w, 0, w.length - sfx.length)) {
          w = w.dropRight(sfx.length)
          val lw = w
          if (lw.endsWith("at") || lw.endsWith("bl") || lw.endsWith("iz")) w += "e"
          else if (w.length >= 2 && Doubles.contains(lw.takeRight(2))) w = w.dropRight(1)
          else {
            r1 = r1Of(lw); // word changed; recompute for the short test
            if (r1 >= w.length && endsShortSyllable(w)) w += "e"
          }
        }
      case None => ()
    }
    r1 = r1Of(w); r2 = regionFrom(w, r1)

    // step 1c: y/Y at end, preceded by a non-vowel which is not the first letter
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') && !isVowel(w(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (longest suffix in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx @ "ogi", rep)) =>
        if (inR1(sfx.length) && w.length > 3 && w.charAt(w.length - 4) == 'l')
          w = w.dropRight(sfx.length) + rep
      case Some((sfx @ "li", rep)) =>
        if (inR1(sfx.length) && w.length > 2 && LiEnding.contains(w.charAt(w.length - 3)))
          w = w.dropRight(sfx.length) + rep
      case Some((sfx, rep)) =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + rep
      case None => ()
    }
    r1 = r1Of(w); r2 = regionFrom(w, r1)

    // step 3 (in R1; "ative" needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx @ "ative", rep)) =>
        if (inR2(sfx.length)) w = w.dropRight(sfx.length) + rep
      case Some((sfx, rep)) =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + rep
      case None => ()
    }
    r1 = r1Of(w); r2 = regionFrom(w, r1)

    // step 4 (longest suffix in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some(sfx @ "ion") =>
        if (inR2(3) && w.length > 3 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      case Some(sfx) =>
        if (inR2(sfx.length)) w = w.dropRight(sfx.length)
      case None => ()
    }
    r1 = r1Of(w); r2 = regionFrom(w, r1)

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("ll") && inR2(1))
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  // ---- CJK width fold + bigram analyzer -----------------------------------

  private val HalfKataBase = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
  private val FullKataBase = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
  private val Voiceable = "カキクケコサシスセソタチツテトハヒフヘホウ".toSet
  private val HalfPunct = Map('｡' -> '。', '｢' -> '「', '｣' -> '」', '､' -> '、', '･' -> '・')

  /** ES `cjk_width` token filter: fullwidth ASCII → halfwidth, halfwidth
    * katakana → fullwidth (with voiced/semi-voiced mark composition). */
  def cjkWidthFold(s: String): String = {
    if (s == null) return null
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '！' && c <= '～') out.append((c - 0xFF01 + 0x21).toChar)
      else if (c == '　') out.append(' ')
      else if (HalfPunct.contains(c)) out.append(HalfPunct(c))
      else {
        val k = HalfKataBase.indexOf(c.toInt)
        if (k >= 0) {
          var full = FullKataBase.charAt(k)
          val next = if (i + 1 < s.length) s.charAt(i + 1) else '\u0000'
          if (next == 'ﾞ' && Voiceable.contains(full)) {
            full = if (full == 'ウ') 'ヴ' else (full + 1).toChar; i += 1
          } else if (next == 'ﾟ' && full >= 'ハ' && full <= 'ホ') {
            full = (full + 2).toChar; i += 1
          }
          out.append(full)
        } else if (c == 'ﾞ') out.append('゛')
        else if (c == 'ﾟ') out.append('゜')
        else out.append(c)
      }
      i += 1
    }
    out.toString
  }

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x3400 && cp <= 0x9FFF) ||  // Han (ext A + unified)
    (cp >= 0xF900 && cp <= 0xFAFF) ||  // Han compat
    (cp >= 0x3040 && cp <= 0x309F) ||  // Hiragana
    (cp >= 0x30A0 && cp <= 0x30FF) ||  // Katakana
    (cp >= 0xAC00 && cp <= 0xD7AF) ||  // Hangul syllables
    (cp >= 0x1100 && cp <= 0x11FF) || (cp >= 0x3130 && cp <= 0x318F) // jamo

  private def isWordChar(cp: Int): Boolean =
    Character.isLetterOrDigit(cp) && !isCjk(cp)

  /** The `cjk` analyzer chain minus the stop filter (which is a column
    * op): cjk_width fold → lowercase → tokenize with CJK runs emitted as
    * overlapping character bigrams (a lone CJK char stays a unigram) and
    * non-CJK runs emitted as whole word tokens. */
  def cjkAnalyze(text: String): Array[String] = {
    if (text == null) return null
    // Locale.ROOT: default-locale toLowerCase diverges per executor JVM
    // (tr_TR folds I to dotless ı) — must match Spark's lower() and the
    // DuckDB oracle on every node.
    val s = cjkWidthFold(text).toLowerCase(java.util.Locale.ROOT)
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isCjk(cp)) {
        val start = i
        var j = i
        while (j < n && isCjk(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
        // emit overlapping bigrams over the run's code points
        val run = s.substring(start, j)
        val cps = run.codePoints().toArray
        if (cps.length == 1) out += run
        else {
          var k = 0
          while (k + 1 < cps.length) {
            out += new String(cps, k, 2); k += 1
          }
        }
        i = j
      } else if (isWordChar(cp)) {
        val start = i
        var j = i
        while (j < n && isWordChar(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
        out += s.substring(start, j)
        i = j
      } else i += Character.charCount(cp)
    }
    out.toArray
  }
}
