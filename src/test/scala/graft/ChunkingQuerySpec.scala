package graft

import graft.functions.TextChunk
import graft.operators.Chunking
import graft.sources.Tables

/** The chunk_fixed column program must agree exactly with the pure Scala
  * kernel (which is itself reference-parity-tested) on real data.
  */
class ChunkingQuerySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("chunk_fixed column program == TextChunk.chunkFixed kernel") {
    val got = Chunking.chunkFixed(spark, dir)
      .collect().map(r => (r.getAs[String]("chunk_id"), r.getAs[String]("chunk"))).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      TextChunk.chunkFixed(text, Chunking.Size, Chunking.Overlap)
        .zipWithIndex.map { case (c, j) => (s"$id#$j", c) }
    }.toMap
    assert(got == want)
  }

  test("chunk_stats p95 sits within [min,max] and avg is consistent") {
    val rows = Chunking.chunkStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("len_min"), r.getAs[Long]("len_max"))
      val p95 = r.getAs[Double]("len_p95")
      assert(p95 >= mn && p95 <= mx, s"p95 $p95 outside [$mn,$mx]")
      assert(r.getAs[Double]("len_avg") >= mn && r.getAs[Double]("len_avg") <= mx)
    }
  }

  test("chunk_histogram bins cover all chunks exactly once") {
    val hist = Chunking.chunkHistogram(spark, dir).collect()
    assert(hist.length == 20)
    val total = hist.map(_.getAs[Long]("n")).sum
    val chunks = Chunking.chunkFixed(spark, dir).count()
    assert(total == chunks)
  }

  test("chunk_tokens windows match a scala token replica") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = Chunking.chunkTokens(spark, dir).collect()
      .map(r => r.getAs[String]("chunk_id") ->
        (r.getAs[String]("chunk"), r.getAs[Long]("n_chunk_tokens"))).toMap
    val size = Chunking.TokenSize
    val step = Chunking.TokenStep
    val want = docs.flatMap { case (id, text) =>
      val t = text.trim
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
      if (toks.isEmpty) Seq.empty
      else {
        val n = toks.length
        val nchunks = if (n <= size) 1 else 1 + (n - size + step - 1) / step
        (0 until nchunks).map { j =>
          val w = toks.slice(j * step, j * step + size)
          s"$id#$j" -> (w.mkString(" "), w.length.toLong)
        }
      }
    }.toMap
    assert(got == want)
    // every chunk except a doc's last holds exactly TokenSize tokens
    val lastOf = want.keys.map(_.split("#")).groupBy(_(0))
      .map { case (d, ks) => d -> ks.map(_(1).toInt).max }
    want.foreach { case (k, (_, n)) =>
      val Array(d, j) = k.split("#")
      if (j.toInt < lastOf(d)) assert(n == size.toLong, s"chunk $k")
    }
  }
  test("chunk_boilerplate counts corpus-duplicated chunk fingerprints per doc") {
    // replica of the 4-lane wide fingerprint (TextOps.fingerprintWide)
    def polyhash(t: String, base: Long, mod: Long): Long = {
      var acc = 0L
      t.foreach(c => acc = (acc * base + c.toLong) % mod)
      acc
    }
    def wide(t: String): Seq[Long] =
      graft.operators.TextOps.FpLanes.map { case (b, m) => polyhash(t, b, m) }
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val chunks = docs.flatMap { case (id, text) =>
      TextChunk.chunkFixed(text, Chunking.Size, Chunking.Overlap)
        .map(chunk => (id, wide(chunk)))
    }
    val nd = chunks.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = chunks.groupBy(_._1).map { case (id, cs) =>
      val boiler = cs.count(c => nd(c._2) >= 2).toLong
      (id, cs.length.toLong, boiler, r6(boiler.toDouble / cs.length))
    }.toSet
    val got = Chunking.chunkBoilerplate(spark, dir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_boilerplate"), r.getAs[Double]("boiler_ratio"))).toSet
    assert(got == want)
  }
}
