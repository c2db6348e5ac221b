package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextChunk

/** Parity tests for the chunking kernels against the reference semantics
  * (`/root/reference/app/ingest/chunker.py:14-51`), hand-computed.
  */
class TextChunkSpec extends AnyFunSuite {

  test("chunkFixed basic windows: size 5, overlap 2 on 12 chars") {
    // i=0 -> [0,5); i=3 -> [3,8); i=6 -> [6,11); i=9 -> [9,12) ends
    assert(TextChunk.chunkFixed("abcdefghijkl", 5, 2) ==
      Seq("abcde", "defgh", "ghijk", "jkl"))
  }

  test("chunkFixed short text is a single chunk; empty is none") {
    assert(TextChunk.chunkFixed("ab", 5, 2) == Seq("ab"))
    assert(TextChunk.chunkFixed("", 5, 2) == Seq.empty)
  }

  test("chunkFixed degenerate overlap >= size still advances (i+1 guard)") {
    assert(TextChunk.chunkFixed("abcd", 2, 5) == Seq("ab", "bc", "cd"))
  }

  test("chunkFixed count matches closed form 1 + ceil((n-size)/step)") {
    for (n <- 1 to 400; size <- Seq(2, 5, 17, 50)) {
      val overlap = size / 4
      val step = size - overlap
      val text = "x" * n
      val got = TextChunk.chunkFixed(text, size, overlap).length
      val want = if (n <= size) 1 else 1 + (n - size + step - 1) / step
      assert(got == want, s"n=$n size=$size overlap=$overlap")
    }
  }

  test("chunkFixed reconstruction: dropping the overlap re-yields the text") {
    for (n <- Seq(1, 42, 99, 100, 101, 179, 180, 181, 500)) {
      val text = (0 until n).map(i => ('a' + i % 26).toChar).mkString
      val chunks = TextChunk.chunkFixed(text, 100, 20)
      val rebuilt = chunks.head + chunks.tail.map(_.drop(20)).mkString
      assert(rebuilt == text, s"n=$n")
    }
  }

  test("chunkSentences greedy pack with tail overlap") {
    val text = "One two. Three four. Five six seven eight."
    // size 20: "One two." (8) + "Three four." (11) packs to exactly 20;
    // the last sentence (21) starts a new chunk.
    val noOv = TextChunk.chunkSentences(text, 20, 0)
    assert(noOv == Seq("One two. Three four.", "Five six seven eight."))
    val ov = TextChunk.chunkSentences(text, 20, 4)
    assert(ov == Seq("One two. Three four.", "our.Five six seven eight."))
  }

  test("chunkSentences no-punctuation text is one chunk even when oversized") {
    val text = "word " * 50 // no sentence boundaries
    assert(TextChunk.chunkSentences(text.trim, 30, 5) == Seq(text.trim))
  }

  test("chunkByHeadings splits sections then fixed-chunks each") {
    // Python re.split-with-capture keeps the heading *marker* as a
    // delimiter but leaves the title text glued to its section body.
    val text = "intro text\n# Title\nsection one body\n## Sub\nsection two"
    val got = TextChunk.chunkByHeadings(text, 100, 0)
    assert(got == Seq("intro text", "Title\nsection one body", "Sub\nsection two"))
  }

  test("chunkByHeadings without headings equals fixed chunking of whole text") {
    val text = "plain text with no headings at all, just words"
    assert(TextChunk.chunkByHeadings(text, 10, 2) ==
      TextChunk.chunkFixed(text, 10, 2))
  }
}
