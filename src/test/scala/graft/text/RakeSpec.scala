package graft.text

import org.scalatest.funsuite.AnyFunSuite

class RakeSpec extends AnyFunSuite {

  private val stop = Set("the", "a", "of", "and", "is", "in")

  test("candidatePhrases splits on stopwords and sentence bounds") {
    val got = Rake.candidatePhrases(
      "The quick fox and the lazy dog. Deep learning is great", stop)
    assert(got == Seq(
      Seq("quick", "fox"), Seq("lazy", "dog"),
      Seq("deep", "learning"), Seq("great")))
  }

  test("long runs are windowed to maxWords") {
    val got = Rake.candidatePhrases("one two three four five", stop, maxWords = 3)
    assert(got == Seq(
      Seq("one", "two", "three"),
      Seq("two", "three", "four"),
      Seq("three", "four", "five")))
  }

  test("extract scores deg/freq and ranks phrases") {
    // "red apple" and "red berry": freq(red)=2, deg(red)=2 → score 2
    // freq(apple)=1, deg(apple)=1 → score 2; phrase scores = 4 each
    val got = Rake.extract("red apple. red berry. cat", stop)
    val byPhrase = got.map(s => s.phrase -> s.score).toMap
    assert(byPhrase("red apple") == 4.0)
    assert(byPhrase("red berry") == 4.0)
    assert(byPhrase("cat") == 1.0)
    // ranked by score desc then phrase asc
    assert(got.map(_.phrase) == Seq("red apple", "red berry", "cat"))
  }

  test("sentence permutation does not change scores") {
    val a = Rake.extract("red apple. red berry. cat", stop)
    val b = Rake.extract("cat. red berry. red apple", stop)
    assert(a.map(s => s.phrase -> s.score).toMap ==
      b.map(s => s.phrase -> s.score).toMap)
  }

  test("empty and null-ish inputs") {
    assert(Rake.extract("", stop).isEmpty)
    assert(Rake.extract("the of and is", stop).isEmpty)
  }
}
