package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{OfficeParsers, Readers}

/** XLSX/DOCX ingest (reference `reader.py:153-154` reads xlsx via pandas;
  * docx gets the same zip+XML treatment): fixtures are generated in-test
  * with java.util.zip — no binary blobs in the repo, and the parser can't
  * accidentally depend on a particular writer's quirks.
  */
class OfficeReadersSpec extends SparkSpec {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def writeTo(dir: Path, name: String, bytes: Array[Byte]): Unit =
    Files.write(dir.resolve(name), bytes)

  private val sharedStringsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst count="4" uniqueCount="4">
      |  <si><t>name</t></si>
      |  <si><t>city</t></si>
      |  <si><t>alice</t></si>
      |  <si><r><t>ber</t></r><r><t>lin</t></r></si>
      |</sst>""".stripMargin

  private val sheet1Xml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet><sheetData>
      |  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>n</t></is></c></row>
      |  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>42</v></c></row>
      |  <row r="3"><c r="A3" t="inlineStr"><is><t>bob</t></is></c><c r="C3" t="b"><v>1</v></c></row>
      |</sheetData></worksheet>""".stripMargin

  private def xlsxBytes: Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "xl/workbook.xml" -> "<workbook/>",
    "xl/sharedStrings.xml" -> sharedStringsXml,
    "xl/worksheets/sheet1.xml" -> sheet1Xml)

  private val documentXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document><w:body>
      |  <w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
      |  <w:p/>
      |  <w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
      |</w:body></w:document>""".stripMargin

  private def docxBytes: Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "word/document.xml" -> documentXml)

  test("parseXlsx: shared strings (incl. rich-text runs), inline, numeric, bool, gaps") {
    val rows = OfficeParsers.parseXlsx(xlsxBytes)
    assert(rows === Seq(
      Seq("name", "city", "n"),
      Seq("alice", "berlin", "42"),
      Seq("bob", null, "true")))
  }

  test("colIndex handles multi-letter refs") {
    assert(OfficeParsers.colIndex("A1") === 0)
    assert(OfficeParsers.colIndex("Z9") === 25)
    assert(OfficeParsers.colIndex("AA7") === 26)
    assert(OfficeParsers.colIndex("AB12") === 27)
  }

  test("readXlsx: header row becomes columns; data distributed; nulls for gaps") {
    val dir = Files.createTempDirectory("graft-xlsx")
    writeTo(dir, "a.xlsx", xlsxBytes)
    val df = Readers.read(spark, dir.toString, "xlsx")
    assert(df.columns.toSeq === Seq("name", "city", "n"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(("alice", "berlin", "42"), ("bob", null, "true")))
  }

  test("readXlsx: a directory of shards unions data rows under one header") {
    val dir = Files.createTempDirectory("graft-xlsx-many")
    writeTo(dir, "a.xlsx", xlsxBytes)
    writeTo(dir, "b.xlsx", xlsxBytes)
    val df = Readers.readXlsx(spark, dir.toString)
    assert(df.count() === 4)
    assert(df.columns.toSeq === Seq("name", "city", "n"))
  }

  test("readXlsx: shards wider or narrower than the header fit its width") {
    // header comes from the lexicographically-first file (a.xlsx, 3 cols);
    // a wider shard's extra cells drop, a narrower shard's gaps are null
    val wide =
      """<?xml version="1.0"?><worksheet><sheetData>
        |  <row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c></row>
        |  <row r="2"><c r="A2" t="inlineStr"><is><t>w1</t></is></c><c r="B2" t="inlineStr"><is><t>EXTRA</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val narrow =
      """<?xml version="1.0"?><worksheet><sheetData>
        |  <row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c></row>
        |  <row r="2"><c r="A2" t="inlineStr"><is><t>n1</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val dir = Files.createTempDirectory("graft-xlsx-mixed")
    writeTo(dir, "a.xlsx", xlsxBytes) // 3-column header wins
    writeTo(dir, "b.xlsx", zip("xl/worksheets/sheet1.xml" -> wide))
    writeTo(dir, "c.xlsx", zip("xl/worksheets/sheet1.xml" -> narrow))
    val df = Readers.readXlsx(spark, dir.toString)
    assert(df.columns.toSeq === Seq("name", "city", "n"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("w1", "EXTRA", null))) // wide shard: col fits, no 4th col anywhere
    assert(rows.contains(("n1", null, null)))    // narrow shard: padded with nulls
  }

  test("parseDocx: paragraphs joined by newlines, runs concatenated, breaks kept") {
    assert(OfficeParsers.parseDocx(docxBytes) === "Hello world\nline one\nline two")
  }

  test("readDocx: one text row per file") {
    val dir = Files.createTempDirectory("graft-docx")
    writeTo(dir, "a.docx", docxBytes)
    writeTo(dir, "b.docx", docxBytes)
    val df = Readers.read(spark, dir.toString, "docx")
    val texts = df.collect().map(_.getString(0)).toSeq
    assert(texts === Seq("Hello world\nline one\nline two", "Hello world\nline one\nline two"))
  }

  test("parseDocx rejects a zip without word/document.xml") {
    intercept[IllegalArgumentException] {
      OfficeParsers.parseDocx(zip("other.xml" -> "<x/>"))
    }
  }

  test("readAny dispatches on the file suffix (reference read_any)") {
    val dir = Files.createTempDirectory("graft-any")
    writeTo(dir, "a.docx", docxBytes)
    assert(Readers.readAny(spark, dir.resolve("a.docx").toString)
      .collect()(0).getString(0).startsWith("Hello world"))
    Files.writeString(dir.resolve("n.md"), "plain markdown line")
    assert(Readers.readAny(spark, dir.resolve("n.md").toString)
      .collect()(0).getString(0) === "plain markdown line")
    intercept[IllegalArgumentException] {
      Readers.readAny(spark, dir.resolve("x.weird").toString)
    }
  }

  test("fuzz: random cell grids round-trip through a generated sheet") {
    val rng = new scala.util.Random(4242)
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def cellText(): String = {
      val alphabet = "abcXYZ019 _-&<>\"'éü|"
      (1 to (1 + rng.nextInt(8))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    (1 to 25).foreach { _ =>
      // grid of Some(text)/None cells; None = the cell element is absent
      val grid = (1 to (1 + rng.nextInt(6))).map { _ =>
        (1 to (1 + rng.nextInt(5))).map(_ =>
          if (rng.nextInt(4) == 0) None else Some(cellText()))
      }
      val rowsXml = grid.zipWithIndex.map { case (row, ri) =>
        val cells = row.zipWithIndex.collect { case (Some(v), ci) =>
          val ref = s"${('A' + ci).toChar}${ri + 1}"
          s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      val bytes = zip(
        "xl/worksheets/sheet1.xml" ->
          s"""<?xml version="1.0" encoding="UTF-8"?><worksheet><sheetData>$rowsXml</sheetData></worksheet>""")
      val got = OfficeParsers.parseXlsx(bytes)
      // parser rows end at the last PRESENT cell; normalize both sides by
      // dropping trailing absent cells (an all-absent row parses empty)
      val want = grid.map(_.map(_.orNull).reverse.dropWhile(_ == null).reverse.toSeq)
      assert(got.map(_.toList) === want.map(_.toList), s"grid: $grid")
    }
  }

  test("an xlsx gold set feeds the eval surface (reference eval_api.py:31-32)") {
    // gold uploads arrive as spreadsheets with q_id / expected_id columns
    val goldSheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet><sheetData>
        |  <row r="1"><c r="A1" t="inlineStr"><is><t>q_id</t></is></c><c r="B1" t="inlineStr"><is><t>expected_id</t></is></c></row>
        |  <row r="2"><c r="A2"><v>0</v></c><c r="B2"><v>7</v></c></row>
        |  <row r="3"><c r="A3"><v>1</v></c><c r="B3"><v>9</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zip(
      "[Content_Types].xml" -> "<Types/>",
      "xl/worksheets/sheet1.xml" -> goldSheet)
    val dir = Files.createTempDirectory("graft-gold")
    writeTo(dir, "gold.xlsx", bytes)
    val gold = graft.operators.Search.goldFromFile(spark, dir.toString, "xlsx")
    assert(gold.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 7L), (1L, 9L)))
  }
}
