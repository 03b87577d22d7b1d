package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sentence splitting: boundaries, both hazard guards, punctuation
  * runs, quote closers, tails, and degenerate input. */
class SentencesSpec extends AnyFunSuite {

  test("plain boundaries split; the tail without punctuation stays") {
    assert(Sentences.split("One here. Two there! Three?").toSeq ==
      Seq("One here.", "Two there!", "Three?"))
    assert(Sentences.split("Starts fine. and lowercase continues").toSeq ==
      Seq("Starts fine. and lowercase continues"))
    assert(Sentences.split("No punctuation at all").toSeq ==
      Seq("No punctuation at all"))
  }

  test("abbreviations and decimals do not split; sentence-final " +
    "periods after them still do") {
    assert(Sentences.split("Dr. Smith arrived. He sat.").toSeq ==
      Seq("Dr. Smith arrived.", "He sat."))
    assert(Sentences.split("See Fig. 3 for detail. Next.").toSeq ==
      Seq("See Fig. 3 for detail.", "Next."))
    assert(Sentences.split("Pi is 3.14 exactly. Indeed.").toSeq ==
      Seq("Pi is 3.14 exactly.", "Indeed."))
    // e.g. mid-sentence (multi-dot abbreviation)
    assert(Sentences.split("Use tools, e.g. Spark. Done.").toSeq ==
      Seq("Use tools, e.g. Spark.", "Done."))
    // ! and ? never abbreviate
    assert(Sentences.split("Stop Dr! Now.").toSeq ==
      Seq("Stop Dr!", "Now."))
  }

  test("punctuation runs and closing quotes ride with the sentence") {
    assert(Sentences.split("What?! Really. \"Sure.\" Yes.").toSeq ==
      Seq("What?!", "Really.", "\"Sure.\"", "Yes."))
    assert(Sentences.split("He said 'go.' Then left.").toSeq ==
      Seq("He said 'go.'", "Then left."))
  }

  test("degenerate input: null, empty, whitespace, lone punctuation") {
    assert(Sentences.split(null).isEmpty)
    assert(Sentences.split("").isEmpty)
    assert(Sentences.split("   ").isEmpty)
    assert(Sentences.split(".").toSeq == Seq("."))
    assert(Sentences.split("A. B. C.").toSeq ==
      Seq("A.", "B.", "C."))
  }
}
