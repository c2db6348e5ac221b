package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.{Chunking, Dedup, TextOps}
import graft.pipeline.CurationPipeline

/** Empty-input behavior of the frame-based library forms: a pipeline
  * over a partition with zero rows (or a filter that drops everything)
  * must yield empty frames with the right schema — not exceptions, not
  * driver hangs in the cluster-propagation loop.
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))

  test("text transforms on an empty frame return empty with the right columns") {
    val q = TextOps.withQuality(emptyDocs)
    assert(q.count() == 0)
    assert(q.columns.toSeq == Seq("doc_id", "text", "n_tokens", "quality"))
    val l = TextOps.withLangid(emptyDocs)
    assert(l.count() == 0)
    assert(l.columns.contains("pred_lang"))
  }

  test("chunking and dedup frame forms tolerate empty input") {
    assert(Chunking.chunkFixedDf(emptyDocs).count() == 0)
    assert(Dedup.dedupExactDf(emptyDocs).count() == 0)
    assert(Dedup.dedupNgramDf(emptyDocs).count() == 0)
    assert(Dedup.dedupMinhashDf(emptyDocs).count() == 0)
    assert(Dedup.dedupVerifiedDf(emptyDocs).count() == 0)
  }

  test("dedup_substring and the prefix sum tolerate empty input") {
    val sub = Dedup.dedupSubstringDf(emptyDocs)
    assert(sub.count() == 0)
    assert(sub.columns.toSeq ==
      Seq("doc_id", "n_tokens", "dup_tokens", "dup_share"))
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val pre = graft.functions.PrefixSum.exclusive(empty, "id", "v", "pre")
    assert(pre.count() == 0)
    assert(pre.columns.contains("pre"))
  }

  test("cluster propagation over an empty pair frame converges immediately") {
    val s = spark
    import s.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.clustersFromPairs(pairs)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_rep", "keep"))
  }

  test("CurationPipeline.run on an empty frame reports zeros without dividing by them") {
    val (curated, decisions, report) = CurationPipeline.run(emptyDocs)
    assert(curated.count() == 0)
    assert(decisions.count() == 0)
    assert(report.nDocs == 0 && report.nKept == 0 && report.keepRate == 0.0)
  }
}
