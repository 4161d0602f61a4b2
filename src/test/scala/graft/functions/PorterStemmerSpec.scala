package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Anchored to the rule examples in Porter 1980, "An algorithm for
  * suffix stripping" (Program 14(3)) — per-step examples and the
  * multi-step chains the paper walks through.
  */
class PorterStemmerSpec extends AnyFunSuite {
  private def s(w: String) = PorterStemmer.stem(w)

  test("step 1a: plural stripping") {
    assert(s("caresses") == "caress")
    assert(s("ponies") == "poni")
    assert(s("ties") == "ti")
    assert(s("caress") == "caress")
    assert(s("cats") == "cat")
  }

  test("step 1b: ed/ing with cleanup") {
    assert(s("feed") == "feed")
    assert(s("plastered") == "plaster")
    assert(s("bled") == "bled")
    assert(s("motoring") == "motor")
    assert(s("sing") == "sing")
    assert(s("conflated") == "conflat") // at→ate, then step5a drops the e
    assert(s("sized") == "size")        // iz→ize, cvc keeps the e
    assert(s("hopping") == "hop")       // double consonant undoubled
    assert(s("tanned") == "tan")
    assert(s("falling") == "fall")      // l exempt from undoubling
    assert(s("hissing") == "hiss")      // s exempt
    assert(s("failing") == "fail")
    assert(s("filing") == "file")       // m=1 cvc → +e
  }

  test("step 1c: y → i only with a vowel in the stem") {
    assert(s("happy") == "happi")
    assert(s("sky") == "sky")
  }

  test("step 2: double-suffix mapping (m > 0)") {
    assert(s("relational") == "relat")     // ational→ate, step4 keeps, 5a drops e... paper chain
    assert(s("conditional") == "condit")   // tional→tion, step4 ion
    assert(s("rational") == "ration")      // ational fails m, step4 al
    assert(s("valenci") == "valenc")       // enci→ence, 5a
    assert(s("digitizer") == "digit")      // izer→ize, step4
    assert(s("operator") == "oper")        // ator→ate, step4
    assert(s("feudalism") == "feudal")     // alism→al, step4 m too small
    assert(s("hopefulness") == "hope")     // fulness→ful, step3 ful→""
    assert(s("formaliti") == "formal")     // aliti→al
  }

  test("step 3: -icate/-ative/-alize/-ical/-ful/-ness") {
    assert(s("triplicate") == "triplic")
    assert(s("formative") == "form")
    assert(s("formalize") == "formal")
    // step3 ical→ic, then step4 strips the ic at m>1 — the paper's
    // "electrical → electric" is the step-3 rule output, not the final stem
    assert(s("electrical") == "electr")
    assert(s("hopeful") == "hope")
    assert(s("goodness") == "good")
  }

  test("step 4: suffix drop at m > 1") {
    assert(s("revival") == "reviv")
    assert(s("allowance") == "allow")
    assert(s("inference") == "infer")
    assert(s("airliner") == "airlin")
    assert(s("gyroscopic") == "gyroscop")
    assert(s("adjustable") == "adjust")
    assert(s("defensible") == "defens")
    assert(s("irritant") == "irrit")
    assert(s("replacement") == "replac")
    assert(s("adjustment") == "adjust")
    assert(s("dependent") == "depend")
    assert(s("adoption") == "adopt")
    assert(s("communism") == "commun")
    assert(s("activate") == "activ")
    assert(s("effective") == "effect")
    assert(s("bowdlerize") == "bowdler")
  }

  test("step 5: final e and double l") {
    assert(s("probate") == "probat")
    assert(s("rate") == "rate")
    assert(s("cease") == "ceas")
    assert(s("controlling") == "control")
    assert(s("rolling") == "roll")
  }

  test("the paper's full chains") {
    assert(s("generalizations") == "gener")
    assert(s("oscillators") == "oscil")
  }

  test("short words pass through") {
    assert(s("a") == "a"); assert(s("is") == "is"); assert(s("be") == "be")
  }
}
