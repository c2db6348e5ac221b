package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFile, MediaMeta}

class MultimodalSpec extends SparkSpec {

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

  test("mediaFiles payload round-trips the utf-8 text") {
    val files = Multimodal.mediaFiles(spark, "/root/testdata/sf0.001").collect()
    assert(files.nonEmpty)
    val f = files.minBy(_.doc_id)
    assert(new String(f.payload, "UTF-8").nonEmpty)
    assert(Set("image", "audio", "video").contains(f.media_type))
  }
}
