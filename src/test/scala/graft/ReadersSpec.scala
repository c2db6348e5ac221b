package graft

import java.nio.file.Files

import graft.sources.Readers

class ReadersSpec extends SparkSpec {

  test("csv ingest normalizes column names and drops all-null rows") {
    val dir = Files.createTempDirectory("graft-readers")
    val f = dir.resolve("t.csv")
    Files.writeString(f, " name ,age\nalice,30\n,,\nbob,25\n")
    val df = Readers.readCsv(spark, f.toString)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 2)
  }

  test("json and text ingest round-trip") {
    val dir = Files.createTempDirectory("graft-readers")
    val j = dir.resolve("t.jsonl")
    Files.writeString(j, """{"a": 1, "b": "x"}""" + "\n" + """{"a": 2, "b": "y"}""" + "\n")
    assert(Readers.read(spark, j.toString, "jsonl").count() == 2)
    val t = dir.resolve("t.txt")
    Files.writeString(t, "line one\nline two\nline three\n")
    val txt = Readers.read(spark, t.toString, "text")
    assert(txt.columns.toSeq == Seq("text") && txt.count() == 3)
  }

  test("html ingest strips tags/script/style, decodes entities, one row per file") {
    val dir = Files.createTempDirectory("graft-readers")
    val h = dir.resolve("page.html")
    Files.writeString(h,
      """<html><head><title>T</title>
        |<style>body { color: red; }</style>
        |<script type="text/javascript">var x = "<ignored>";</script>
        |</head><body>
        |<!-- a comment -->
        |<h1 class="big">Hello &amp; welcome</h1>
        |<p>1 &lt; 2, x&nbsp;y, it&#39;s fine</p>
        |</body></html>""".stripMargin)
    val df = Readers.read(spark, h.toString, "html")
    assert(df.columns.toSeq == Seq("text"))
    val rows = df.collect()
    assert(rows.length == 1)
    val text = rows(0).getString(0)
    assert(text.contains("Hello & welcome"))
    assert(text.contains("1 < 2, x y, it's fine"))
    assert(text.contains("T")) // title text survives
    assert(!text.contains("color: red") && !text.contains("var x"))
    assert(!text.contains("<") || text.contains("1 < 2")) // no tags left
    assert(!text.contains("comment"))
    // double-escaped entity decodes one level only, like html.unescape-once
    val h2 = dir.resolve("esc.html")
    Files.writeString(h2, "<p>&amp;lt;tag&amp;gt;</p>")
    assert(Readers.readHtml(spark, h2.toString).collect()(0).getString(0)
      == "&lt;tag&gt;")
  }

  test("unknown formats fail fast with a clear message") {
    // xlsx/docx now parse dependency-free (OfficeReadersSpec); anything
    // else still fails fast rather than guessing.
    val e = intercept[IllegalArgumentException] {
      Readers.read(spark, "/tmp/x.pdf", "pdf")
    }
    assert(e.getMessage.contains("unknown format"))
  }

}
