package graft.functions

/** Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3) 1980 — public domain algorithm; reference exposes it
  * as the tantivy `stemmer` token filter,
  * `tantivy-binding/src/analyzer/filter/stemmer_filter.rs`).
  *
  * Pure function over a lowercase word; the analyzer applies it via a
  * deterministic UDF at ingest/index-build time (not on the scan
  * path), same placement as the WordBreak tokenizers.
  */
object PorterStemmer {

  private def isVowel(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1)
    case _ => false
  }

  /** The measure m: number of VC sequences in the stem. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && !isVowel(s, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(s, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(s, i)) i += 1 }
    }
    m
  }

  private def hasVowel(s: String): Boolean = s.indices.exists(isVowel(s, _))

  private def endsDoubleConsonant(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      !isVowel(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && !isVowel(s, s.length - 3) && isVowel(s, s.length - 2) &&
      !isVowel(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

  /** Replace `suffix` with `repl` if the remaining stem's measure > m. */
  private def repl(s: String, suffix: String, r: String, minM: Int): Option[String] =
    if (s.endsWith(suffix)) {
      val stem = s.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + r) else Some(s)
    } else None

  private def firstOf(s: String, rules: Seq[(String, String)], minM: Int): String =
    rules.collectFirst {
      case (suf, r) if s.endsWith(suf) =>
        repl(s, suf, r, minM).get
    }.getOrElse(s)

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var s = word
    // Step 1a
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ies")) s = s.dropRight(2)
    else if (!s.endsWith("ss") && s.endsWith("s")) s = s.dropRight(1)
    // Step 1b
    var extraCleanup = false
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s = s.dropRight(1)
    } else if (s.endsWith("ed") && hasVowel(s.dropRight(2))) {
      s = s.dropRight(2); extraCleanup = true
    } else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) {
      s = s.dropRight(3); extraCleanup = true
    }
    if (extraCleanup) {
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s = s + "e"
      else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s = s.dropRight(1)
      else if (measure(s) == 1 && endsCvc(s)) s = s + "e"
    }
    // Step 1c
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s = s.dropRight(1) + "i"
    // Step 2 (m > 0), longest-match-first per ending letter as published
    s = firstOf(s, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
      "logi" -> "log"), 0)
    // Step 3 (m > 0)
    s = firstOf(s, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""), 0)
    // Step 4 (m > 1): drop the suffix entirely
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    s = s match {
      case w if w.endsWith("ion") &&
          (w.length > 3 && "st".contains(w.charAt(w.length - 4))) =>
        val stem = w.dropRight(3)
        if (measure(stem) > 1) stem else w
      case w =>
        step4.collectFirst {
          case suf if w.endsWith(suf) =>
            val stem = w.dropRight(suf.length)
            if (measure(stem) > 1) stem else w
        }.getOrElse(w)
    }
    // Step 5a
    if (s.endsWith("e")) {
      val stem = s.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) s = stem
    }
    // Step 5b
    if (measure(s) > 1 && endsDoubleConsonant(s) && s.endsWith("l"))
      s = s.dropRight(1)
    s
  }
}
