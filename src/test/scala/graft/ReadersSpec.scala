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

  test("office formats fail fast with a clear message") {
    val e = intercept[UnsupportedOperationException] {
      Readers.read(spark, "/tmp/x.xlsx", "xlsx")
    }
    assert(e.getMessage.contains("convert to csv/json/parquet"))
  }
}
