package graft

import graft.operators.Curation
import graft.pipeline.CurationPipeline
import graft.sources.Tables

class CurationPipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("default-config decisions equal the oracle-gated pipeline_filter") {
    val docs = Tables.documents(spark, dir)
    val got = CurationPipeline.decide(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("quality"), r.getAs[String]("pred_lang"),
          r.getAs[Boolean]("dup_keep"), r.getAs[Boolean]("keep"))).toMap
    val want = Curation.pipelineFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("quality"), r.getAs[String]("pred_lang"),
          r.getAs[Boolean]("dup_keep"), r.getAs[Boolean]("keep"))).toMap
    assert(got == want)
  }

  test("run returns the kept docs, consistent report, and packing columns") {
    val docs = Tables.documents(spark, dir)
    val (curated, decisions, report) =
      CurationPipeline.run(docs, CurationPipeline.Config(applyPacking = true))
    val dec = decisions.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(report.nDocs == dec.size.toLong)
    assert(report.nKept == dec.count(_._2).toLong)
    assert(report.nSampledOut == 0L, "sampling is off by default")
    assert(math.abs(report.keepRate - report.nKept.toDouble / report.nDocs) < 1e-12)
    val rows = curated.collect()
    assert(rows.nonEmpty)
    // curated ⊆ kept decisions; packing offsets stay under the budget
    rows.foreach { r =>
      assert(dec(r.getAs[Long]("doc_id")), "curated doc was not marked keep")
      val off = r.getAs[Long]("seq_offset")
      assert(off >= 0 && off < CurationPipeline.Config().packBudget)
      assert(r.getAs[Long]("seq_id") >= 0)
    }
  }

  test("sampling stage downsamples exactly by the deterministic hash rule") {
    val docs = Tables.documents(spark, dir)
    val withS = CurationPipeline.decide(docs,
      CurationPipeline.Config(applySampling = true)).collect()
    val baseline = CurationPipeline.decide(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val sample = Curation.curationSample(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    withS.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("sample_keep") == sample(id),
        s"doc $id sample decision drifted from curation_sample")
      assert(r.getAs[Boolean]("keep") == (baseline(id) && sample(id)))
    }
  }
}
