package graft

import graft.functions.{PolyHash, WordShingles}

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions resolve and match the kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_polyhash('abc') AS h,
        |       graft_polyhash('abc', 31, 1000000007) AS h2,
        |       graft_word_shingles('a b c d') AS sh,
        |       graft_word_shingles('a b c d', 2) AS sh2""".stripMargin).collect()(0)
    assert(r.getAs[Long]("h") == 96354L)
    assert(r.getAs[Long]("h2") == 96354L)
    assert(r.getSeq[String](2) == WordShingles.shingles("a b c d", 3).toSeq)
    assert(r.getSeq[String](3) == Seq("a b", "b c", "c d"))
  }

  test("SQL functions compose with table queries") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_ext")
    val rows = spark.sql(
      "SELECT doc_id, graft_polyhash(text) AS fp FROM docs_ext LIMIT 5").collect()
    rows.foreach { row =>
      assert(row.getAs[Long]("fp") >= 0)
    }
    // spot-check one against the kernel
    val one = spark.sql(
      "SELECT text, graft_polyhash(text) AS fp FROM docs_ext WHERE doc_id = 0").collect()(0)
    assert(one.getAs[Long]("fp") == PolyHash.hash(one.getString(0), 31, 1000000007L))
  }

  test("round-3 kernels resolve through SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash_chunks('a b c d e') AS sh,
        |  graft_highlight_spans('Spark loves spark', 'spark') AS hl,
        |  graft_chunk_text('abcdefghij', 'fixed', 5, 2) AS ck,
        |  graft_text_entropy('aabb') AS te""".stripMargin)
      .collect()(0)
    assert(r.getSeq[Long](0).length == 4)
    val spans = r.getSeq[org.apache.spark.sql.Row](1)
    assert(spans.map(s => (s.getLong(0), s.getLong(1))) == Seq((0L, 5L), (12L, 17L)))
    assert(r.getSeq[String](2) == graft.functions.TextChunk.chunkFixed("abcdefghij", 5, 2))
    val te = r.getSeq[Double](3)
    assert(te == Seq(2.0, 1.0)) // 2 distinct chars, uniform -> 1 bit
  }

  test("graft_slice_hash resolves through SQL and matches the kernel") {
    graft.GraftExtensions.register(spark)
    // length divisible by both bit counts -> equal slices of uniform
    // content tie the mean exactly, so every bit is 0
    val text = "x" * 120
    val r = spark.sql(s"SELECT graft_slice_hash('$text') AS d, graft_slice_hash('$text', 4) AS b4")
      .collect()(0)
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
    // short input -> null (no slice may be empty)
    assert(spark.sql("SELECT graft_slice_hash('short') AS h").collect()(0).isNullAt(0))
  }


  test("graft_pair_counts resolves through SQL and matches the kernel") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_pair_counts('abc ab') AS pc").collect()(0)
    val m = r.getMap[String, Long](0).toMap
    assert(m == Map("ab" -> 2L, "bc" -> 1L))
  }

  test("graft_word_window_hashes resolves through SQL and matches the kernel") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_word_window_hashes('a b c', 2) AS h").collect()(0)
    val got = r.getSeq[Long](0)
    val want = graft.functions.WordWindowHashes.hashes("a b c", 2).toSeq
    assert(got == want && got.length == 2)
    // default n = the dedup_substring window length
    val d = spark.sql("SELECT graft_word_window_hashes('a b c') AS h")
      .collect()(0).getSeq[Long](0)
    assert(d.isEmpty) // 3 tokens < the 8-token default window
  }
}
