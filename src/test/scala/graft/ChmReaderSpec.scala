package graft

import java.nio.file.{Files, Path}

import graft.sources.{ChmParser, Readers}

/** `.chm` ingest (reference `reader.py:139-149` can only decompile via
  * Windows `hh.exe` or 7-Zip and raises otherwise; here the ITSF container
  * and LZX stream parse in-process). The committed fixtures under
  * `src/test/resources/chm/` are written by `scripts/make_chm_fixture.py`
  * — an independent, spec-derived (ITSF/ITSP + [MS-PATCH] LZX) Python
  * ENCODER with no CHM library — so these tests cross-check two
  * separately-written codecs of the same public binary format, byte-exact.
  *
  * help_small.chm: one LZX frame, one verbatim block with real matches and
  * repeated-offset slots; a section-0 (stored) entry; a .txt entry the
  * text extractor must skip. help_blocks.chm: 48 pages over 6 frames with
  * a 2-frame reset interval and a verbatim / aligned-offset / uncompressed
  * block mix — every block type, frame re-alignment, mid-stream resets.
  */
class ChmReaderSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/chm/$name")
    assert(in != null, s"missing committed fixture /chm/$name")
    try in.readAllBytes() finally in.close()
  }

  // the generator's literals, replicated verbatim (both sides byte-exact)
  private val IndexHtml =
    """<html><head><title>Graft Help</title>
      |<style>body { color: red; }</style>
      |<script>var x = "should not appear";</script>
      |</head><body>
      |<h1>Welcome &amp; Overview</h1>
      |<p>This is the index page of the help file.</p>
      |<!-- a comment that must vanish -->
      |<p>Second paragraph with &lt;angles&gt; and &quot;quotes&quot;.</p>
      |</body></html>""".stripMargin

  private def pageHtml(i: Int) =
    s"""<html><head><title>Topic $i</title></head><body>
       |<h1>Topic $i</h1>
       |<p>Shared boilerplate paragraph that repeats on every topic page so the
       |compressor finds long matches across entries.</p>
       |<p>Unique content for topic $i.</p>
       |</body></html>""".stripMargin

  private val CoverHtml = "<html><body><p>Uncompressed cover page.</p></body></html>"

  private def blocksPage(i: Int): String =
    s"<html><body><h1>Page $i</h1>" +
      s"the quick brown fox jumps over the lazy dog $i " * 80 +
      "</body></html>"

  test("extract: verbatim block with matches + stored section-0 entry, byte-exact") {
    val entries = ChmParser.extract(fixture("help_small.chm")).toMap
    assert(entries.keySet == Set("/index.htm", "/pages/p1.htm", "/pages/p2.htm",
      "/toc.hhc", "/readme.txt", "/cover.htm"))
    assert(new String(entries("/index.htm"), "UTF-8") == IndexHtml)
    assert(new String(entries("/pages/p1.htm"), "UTF-8") == pageHtml(1))
    assert(new String(entries("/pages/p2.htm"), "UTF-8") == pageHtml(2))
    assert(new String(entries("/cover.htm"), "UTF-8") == CoverHtml)
    assert(new String(entries("/readme.txt"), "UTF-8") == "plain text, not extracted")
  }

  test("extract: aligned + uncompressed blocks, frame re-alignment, resets") {
    val entries = ChmParser.extract(fixture("help_blocks.chm")).toMap
    assert(entries.size == 48)
    (0 until 48).foreach { i =>
      val name = f"/p$i%03d.htm"
      assert(new String(entries(name), "UTF-8") == blocksPage(i), s"mismatch at $name")
    }
  }

  test("parseChm: HTML-family filter, script/style stripped, entities decoded") {
    val rows = ChmParser.parseChm(fixture("help_small.chm")).toMap
    // .txt is not in the reference's extracted set (reader.py:63); the
    // .hhc is tags-and-attributes only, so its text is empty and dropped
    // (the reference's `if text.strip()` does the same, reader.py:74-75)
    assert(rows.keySet == Set("index.htm", "pages/p1.htm", "pages/p2.htm",
      "cover.htm"))
    val idx = rows("index.htm")
    assert(!idx.contains("should not appear") && !idx.contains("color: red"))
    assert(!idx.contains("comment that must vanish"))
    assert(idx.contains("Welcome & Overview"))
    assert(idx.contains("with <angles> and \"quotes\""))
    assert(rows("cover.htm") == "Uncompressed cover page.")
  }

  test("readChm + readAny dispatch: one row per HTML entry, path column") {
    val dir = Files.createTempDirectory("graft-chm")
    Files.write(dir.resolve("help_small.chm"), fixture("help_small.chm"))
    Files.write(dir.resolve("help_blocks.chm"), fixture("help_blocks.chm"))
    val df = Readers.readAny(spark, dir.resolve("help_blocks.chm").toString)
    assert(df.columns.toSeq == Seq("path", "text"))
    assert(df.count() == 48)
    // a directory of .chm files fans out per file, rows from both
    val all = Readers.readChm(spark, dir.toString)
    assert(all.count() == 48 + 4)
  }

  test("malformed input fails with a clear message") {
    val bad = intercept[IllegalArgumentException](
      ChmParser.parseChm("not a chm file at all, padded past the minimum".getBytes ++ new Array[Byte](100)))
    assert(bad.getMessage.contains("ITSF"))
    val truncated = fixture("help_small.chm").take(200)
    intercept[RuntimeException](ChmParser.parseChm(truncated))
  }
}
