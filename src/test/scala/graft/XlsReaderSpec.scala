package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import graft.sources.{Readers, XlsParser}

/** Legacy `.xls` ingest (reference `reader.py:153` routes `.xls` through
  * `pd.read_excel`, same as `.xlsx`). The committed fixtures under
  * `src/test/resources/xls/` are written by `scripts/make_xls_fixture.py`
  * — an independent, spec-derived (MS-CFB + MS-XLS) Python encoder with no
  * Excel library — so these tests cross-check two separately-written
  * codecs of the same public binary format.
  *
  * products.xls (3 KB): CFB mini-stream path, SST split across a CONTINUE
  * record, a decoy second sheet that must be ignored, 8/16-bit strings,
  * NUMBER, RK int / div-100 / truncated-double forms, BOOLERR, blank gaps.
  * products_many.xls (17 KB): regular FAT-chain path, MULRK runs, 300 rows.
  */
class XlsReaderSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/xls/$name")
    assert(in != null, s"missing committed fixture /xls/$name")
    try in.readAllBytes() finally in.close()
  }

  private def fixtureDir(names: String*): Path = {
    val dir = Files.createTempDirectory("graft-xls")
    names.foreach { n =>
      Files.write(dir.resolve(n), fixture(n))
    }
    dir
  }

  test("parseXls: mini-stream CFB, SST CONTINUE, every cell record form") {
    val rows = XlsParser.parseXls(fixture("products.xls"))
    assert(rows.length == 4)
    assert(rows(0) == Seq("sku", "name", "price", "in_stock", "qty"))
    // RK div-100 (19.99), BOOLERR, RK int — and the unicode SST entry that
    // crosses into the CONTINUE record
    assert(rows(1) == Seq("widget", "naïve — ünïcode ✓", "19.99", "true", "7"))
    // blank cell -> null gap; NUMBER renders integrally when integral
    assert(rows(2) == Seq("gadget", null, "3.5", "false", "12345678"))
    // RK truncated-double and a negative RK int (sign-preserving shift)
    assert(rows(3) == Seq("widget", "gadget", "2.25", "true", "-3"))
  }

  test("parseXls: only the first BOUNDSHEET sheet is read (decoy ignored)") {
    val rows = XlsParser.parseXls(fixture("products.xls"))
    assert(!rows.flatten.contains("999"), "decoy sheet leaked into the grid")
  }

  test("parseXls: FAT-chain stream with MULRK runs") {
    val rows = XlsParser.parseXls(fixture("products_many.xls"))
    assert(rows.length == 301)
    assert(rows(0) == Seq("sku", "a", "b", "c"))
    assert(rows(1) == Seq("row0", "0", "0", "0"))
    assert(rows(42) == Seq("row41", "41", "82", "0.41"))
    assert(rows(300) == Seq("row299", "299", "598", "2.99"))
  }

  test("parseXls fails fast on non-OLE2 bytes and on encrypted/BIFF5 markers") {
    val notOle = intercept[IllegalArgumentException] {
      XlsParser.parseXls("PK this is a zip, not OLE2".getBytes("UTF-8") ++ new Array[Byte](600))
    }
    assert(notOle.getMessage.contains("OLE2"))
  }

  test("parseXls fails cleanly on a truncated container") {
    val whole = fixture("products.xls")
    val cut = java.util.Arrays.copyOfRange(whole, 0, 700) // past the header, mid-FAT
    val e = intercept[IllegalArgumentException] { XlsParser.parseXls(cut) }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("OLE2") ||
      e.getMessage.contains("stream"))
  }

  test("readXls: header row becomes columns; data distributed; nulls for gaps") {
    val dir = fixtureDir("products.xls")
    val df = Readers.read(spark, dir.toString, "xls")
    assert(df.columns.toSeq == Seq("sku", "name", "price", "in_stock", "qty"))
    val byPrice = df.collect().map(r => r.getString(2) -> r).toMap
    assert(byPrice("19.99").getString(1) == "naïve — ünïcode ✓")
    assert(byPrice("3.5").isNullAt(1))
    assert(byPrice("2.25").getString(4) == "-3")
  }

  test("readXls: a directory of shards unions data rows under one header") {
    // header from the lexicographically-first file (products.xls, 5 cols);
    // the 4-col shard's rows fit that header with a null tail
    val dir = fixtureDir("products.xls", "products_many.xls")
    val df = Readers.readXls(spark, dir.toString)
    assert(df.columns.length == 5)
    assert(df.count() == 3 + 300)
    assert(df.where(df("sku") === "row123").collect()(0).isNullAt(4))
  }

  test("readAny dispatches .xls") {
    val dir = fixtureDir("products.xls")
    val src = dir.resolve("products.xls")
    val dst = dir.resolve("renamed.XLS")
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.delete(src)
    val df = Readers.readAny(spark, dst.toString)
    assert(df.count() == 3)
  }
}
