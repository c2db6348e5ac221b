package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure chunking kernels mirroring the reference semantics
  * (`/root/reference/app/ingest/chunker.py:14-51`), re-expressed as plain
  * Scala so they are unit-testable and usable from narrow Spark maps.
  *
  * These run inside executors as per-row functions (zero shuffle); at 100 TB
  * they stay embarrassingly parallel. `chunkFixed` additionally has a pure
  * column-expression form in [[graft.operators.Chunking]] (posexplode +
  * substring) that stays inside WholeStageCodegen — prefer that one in hot
  * paths; these Scala kernels back the regex-heavy variants.
  */
object TextChunk {

  /** Fixed char windows `size` with `overlap`; chunker.py:14-21. */
  def chunkFixed(text: String, size: Int, overlap: Int): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val j = math.min(i + size, n)
      out += text.substring(i, j)
      if (j == n) return out.toSeq
      i = math.max(j - overlap, i + 1)
    }
    out.toSeq
  }

  private val SentenceRe = "(?<=[.!?])\\s+"

  /** Greedy sentence packing ≤ size with tail-overlap; chunker.py:25-37. */
  def chunkSentences(text: String, size: Int, overlap: Int): Seq[String] = {
    val sents = text.split(SentenceRe)
    val out = ArrayBuffer.empty[String]
    var cur = ""
    for (s <- sents) {
      if (cur.length + s.length + 1 <= size) cur = (cur + " " + s).trim
      else {
        if (cur.nonEmpty) out += cur
        cur = s
      }
    }
    if (cur.nonEmpty) out += cur
    if (overlap > 0 && out.length > 1)
      (out.head +: (1 until out.length).map(i => out(i - 1).takeRight(overlap) + out(i))).toSeq
    else out.toSeq
  }

  private val HeadingRe = java.util.regex.Pattern.compile("\\n\\s*(#+|<h[1-3]>|</h[1-3]>)")

  /** Split on markdown/html headings (keeping Python re.split-with-capture
    * semantics: text parts interleaved with captured delimiters), then
    * fixed-chunk each section; chunker.py:39-51.
    */
  def chunkByHeadings(text: String, size: Int, overlap: Int): Seq[String] = {
    // Replicate python re.split(pattern-with-one-group): [text, group, text, ...]
    val parts = ArrayBuffer.empty[String]
    val m = HeadingRe.matcher(text)
    var last = 0
    while (m.find()) {
      parts += text.substring(last, m.start())
      parts += m.group(1)
      last = m.end()
    }
    parts += text.substring(last)

    val joined = ArrayBuffer.empty[String]
    var buf = ""
    for (p <- parts) {
      val t = p.trim
      if (p.nonEmpty && (t.startsWith("#") || t.startsWith("<h") || t.startsWith("</h"))) {
        if (buf.nonEmpty) { joined += buf.trim; buf = "" }
      } else buf += ("\n" + p)
    }
    if (buf.nonEmpty) joined += buf.trim
    joined.toSeq.flatMap(sect => chunkFixed(sect, size, overlap))
  }
}
