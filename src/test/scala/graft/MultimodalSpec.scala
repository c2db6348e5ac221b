package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFile, MediaMeta}
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("extractMeta runs the decode stub per partition with typed rows") {
    val s = spark
    import s.implicits._
    val files = Seq(
      MediaFile(0, "image", "aaaa".getBytes("UTF-8")),
      MediaFile(1, "audio", "bbbbbb".getBytes("UTF-8")),
      MediaFile(2, "video", "cc".getBytes("UTF-8"))).toDS().repartition(2)
    val metas = Multimodal.extractMeta(files).collect().sortBy(_.doc_id)
    assert(metas.toSeq == Seq(
      MediaMeta(0, "image", 4, Some(320), Some(240), None),
      MediaMeta(1, "audio", 6, None, None, Some(0.006)),
      MediaMeta(2, "video", 2, None, None, Some(0.002))))
  }

  test("resize plan preserves aspect ratio within the 256 cap") {
    val rows = graft.operators.Multimodal.multimodalResize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_width"), r.getAs[Long]("out_height"))
      assert(math.max(ow, oh) <= graft.operators.Multimodal.ResizeMaxDim)
      assert(ow <= w && oh <= h)
      // aspect preserved within 1px of the float plan
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.05)
      assert(r.getAs[Long]("out_bytes") == ow * oh * 3)
    }
  }

  test("frame sampling emits <= 8 uniformly-stepped frames per video") {
    val rows = graft.operators.Multimodal.multimodalFramesample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("sample_idx"))
      assert(sorted.length <= graft.operators.Multimodal.MaxSampledFrames)
      val idxs = sorted.map(_.getAs[Long]("frame_idx"))
      val n = sorted.head.getAs[Long]("n_frames")
      assert(idxs.forall(i => i >= 0 && i < n))
      if (idxs.length > 1) {
        val steps = idxs.sliding(2).map(p => p(1) - p(0)).toSeq
        assert(steps.distinct.length == 1, "uniform step")
      }
    }
  }

  test("extractFeatures runs the stub encoder per partition with stable output") {
    val files = graft.operators.Multimodal.mediaFiles(spark, dir)
    val f1 = graft.operators.Multimodal.extractFeatures(files).collect()
      .map(m => m.doc_id -> m.features.toSeq).toMap
    assert(f1.nonEmpty)
    assert(f1.values.forall(_.length == graft.functions.Embedder.DefaultDim))
    // deterministic: same payload -> same features
    val f2 = graft.operators.Multimodal.extractFeatures(files).collect()
      .map(m => m.doc_id -> m.features.toSeq).toMap
    assert(f1 == f2)
    // normalized
    f1.values.take(5).foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3)
    }
  }

  test("mediaFiles payload round-trips the utf-8 text") {
    val files = Multimodal.mediaFiles(spark, "/root/testdata/sf0.001").collect()
    assert(files.nonEmpty)
    val f = files.minBy(_.doc_id)
    assert(new String(f.payload, "UTF-8").nonEmpty)
    assert(Set("image", "audio", "video").contains(f.media_type))
  }

  private def phashReplica(text: String, bits: Int): Long = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val sums = new Array[Long](bits)
    var total = 0L
    for (p <- 0 until n) { sums(p * bits / n) += cps(p); total += cps(p) }
    (0 until bits).foldLeft(0L)((h, k) =>
      if (sums(k) * bits > total) h | (1L << k) else h)
  }

  test("multimodal_phash matches an independent slice-hash replica") {
    val dir = "/root/testdata/sf0.001"
    val got = Multimodal.multimodalPhash(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect {
      case (id, t) if id % 3 == 0 && t.codePointCount(0, t.length) >= Multimodal.PhashBits =>
        id -> ((phashReplica(t, Multimodal.PhashBits),
          t.codePointCount(0, t.length).toLong))
    }
    assert(got === want)
  }

  test("phash pairs respect the hamming bound and chunk-share requirement") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Multimodal.multimodalPhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ph = Multimodal.multimodalPhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h <= Multimodal.PhashMaxHamming)
      assert(java.lang.Long.bitCount(ph(a) ^ ph(b)) == h)
      // candidates must share at least one 15-bit chunk
      val shares = (0 until Multimodal.PhashChunks).exists { j =>
        ((ph(a) >> (j * Multimodal.PhashChunkBits)) & 0x7fffL) ==
          ((ph(b) >> (j * Multimodal.PhashChunkBits)) & 0x7fffL)
      }
      assert(shares, s"pair ($a,$b) shares no chunk")
    }
  }

  test("phash hamming: identical payloads 0, perturbed payloads small, random large") {
    import graft.functions.SliceHash
    def h(s: String): Long = {
      val df = spark.range(1).select(SliceHash.column(
        org.apache.spark.sql.functions.lit(s), Multimodal.PhashBits).as("h"))
      df.collect()(0).getLong(0)
    }
    val base = ("a quiet image of a lake at dawn with mist over the water " * 4)
    val ham = (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b)
    assert(ham(h(base), h(base)) === 0)
    // local perturbation flips few slice bits
    assert(ham(h(base), h(base.replace("dawn", "dusk"))) <= 12)
    // unrelated content diverges much further
    val other = ("completely different payload with loud city traffic noise " * 4)
    assert(ham(h(base), h(other)) > 12)
  }
  test("audiowindows tile every audio stream with 1s windows at 0.5s hop") {
    val rows = Multimodal.multimodalAudiowindows(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_samples"),
        r.getAs[Long]("win_idx"), r.getAs[Long]("start_sample"),
        r.getAs[Long]("end_sample"), r.getAs[Boolean]("padded"),
        r.getAs[Double]("t_start_s")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, k, s, e, pad, t) =>
      assert(s == k * Multimodal.HopSamples)
      assert(e == math.min(s + Multimodal.WinSamples, n))
      assert(pad == (s + Multimodal.WinSamples > n))
      assert(math.abs(t - s.toDouble / Multimodal.AudioRate) < 1e-6)
    }
    rows.groupBy(_._1).foreach { case (_, ws) =>
      val n = ws.head._2
      val idx = ws.map(_._3).sorted
      assert(idx.head == 0L, "first window starts at sample 0")
      assert(idx.toSeq == (0L until idx.length.toLong).toSeq, "window indices are dense")
      // coverage: the dropped tail after the last window is under one hop
      val last = ws.maxBy(_._3)
      assert(n - last._5 < Multimodal.HopSamples,
        "tail dropped by the last window must be shorter than a hop")
      // only the last window may need padding
      ws.filter(_._6).foreach(w => assert(w._3 == last._3))
    }
    // every audio doc is framed
    val nAudio = Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 1).count()
    assert(rows.map(_._1).distinct.length.toLong == nAudio)
  }
}
