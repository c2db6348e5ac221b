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
    // rows carry their source archive: "<archive>/<entry path>"
    assert(df.select("path").collect()
      .forall(_.getString(0).startsWith("help_blocks.chm/")))
    // a directory of .chm files fans out per file, rows from both,
    // attributed to their archives
    val all = Readers.readChm(spark, dir.toString)
    assert(all.count() == 48 + 4)
    val byArchive = all.select("path").collect().map(_.getString(0))
      .groupBy(_.takeWhile(_ != '/'))
    assert(byArchive.keySet == Set("help_blocks.chm", "help_small.chm"))
    assert(byArchive("help_blocks.chm").length == 48)
    assert(byArchive("help_small.chm").length == 4)
  }

  // the generator's e8_code_entry, replicated verbatim: E8 call sites
  // whose targets the compressor translated (and the decoder must
  // inverse-translate) plus guard-failing payloads passed through raw
  private def e8CodeEntry: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val rels = Array(0, 16, -5, 0x7FFFFF00)
    (0 until 40).foreach { k =>
      out.write(Array[Byte](0x90.toByte, 0x90.toByte, 0x55, 0x89.toByte))
      out.write(0xE8)
      val r = rels(k % 4)
      out.write(Array[Byte](r.toByte, (r >> 8).toByte, (r >> 16).toByte,
        (r >> 24).toByte))
    }
    out.write(Array.fill[Byte](16)(0x90.toByte))
    out.toByteArray
  }

  test("extract: E8 translation round-trips call targets byte-exactly") {
    val entries = ChmParser.extract(fixture("help_e8.chm")).toMap
    assert(entries.keySet == Set("/index.htm", "/code.bin", "/pages/p1.htm"))
    // the binary entry's translated AND guard-failing E8 payloads both
    // come back as authored
    assert(java.util.Arrays.equals(entries("/code.bin"), e8CodeEntry))
    // the surrounding HTML (which the translation pass scans too) is intact
    assert(new String(entries("/index.htm"), "UTF-8") == IndexHtml)
    assert(new String(entries("/pages/p1.htm"), "UTF-8") == pageHtml(1))
  }

  // the generator's far-fixture literals, replicated verbatim
  private val FarBody = "QXZJ0W9K7QXZ1V8M2QZX" * 100 + "JWQK3ZX5VQ" * 40
  private def farFiller(i: Int): String =
    f"<html><body><h1>Fill $i%d</h1>" +
      s"common filler words repeat across pages $i " * 120 +
      "</body></html>"

  test("extract: windowBits 21 with a >16-extra-bit match offset") {
    val entries = ChmParser.extract(fixture("help_far.chm")).toMap
    assert(entries.size == 98)
    val far = s"<html><body>$FarBody</body></html>"
    // far1 is a verbatim repeat of far0 at ~500 KiB distance — its match
    // offsets need the 17-bit split footer read (asserted emitted by the
    // generator's expect_extra17)
    assert(new String(entries("/far0.htm"), "UTF-8") == far)
    assert(new String(entries("/far1.htm"), "UTF-8") == far)
    (0 until 96).foreach { i =>
      assert(new String(entries(f"/fill$i%02d.htm"), "UTF-8") == farFiller(i))
    }
  }

  test("malformed input fails with a clear message") {
    val bad = intercept[IllegalArgumentException](
      ChmParser.parseChm("not a chm file at all, padded past the minimum".getBytes ++ new Array[Byte](100)))
    assert(bad.getMessage.contains("ITSF"))
    val truncated = fixture("help_small.chm").take(200)
    intercept[RuntimeException](ChmParser.parseChm(truncated))
  }
}
