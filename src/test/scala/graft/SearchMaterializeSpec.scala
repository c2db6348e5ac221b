package graft

import graft.operators.Search

/** The shared per-doc term-stats frame has two materialization modes
  * (Search.MaterializeKey): `local` (localCheckpoint — fast, but blocks die
  * with their executor on a real cluster) and `parquet` (scratch table —
  * survives executor loss; the cluster-safe setting). Both must produce
  * identical downstream results.
  */
class SearchMaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("materialize parquet mode round-trips rows and reads from files") {
    val sess = spark.newSession()
    sess.conf.set(Search.MaterializeKey, "parquet")
    sess.conf.set(Search.ScratchDirKey,
      java.nio.file.Files.createTempDirectory("graft-scratch").toString)
    import sess.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val out = Search.materialize(sess, df, "spec_roundtrip")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"expected a parquet scan, got:\n$plan")
  }

  test("bm25 is identical under local-checkpoint and parquet materialization") {
    val sess = sess2
    val base = Search.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaParquet = Search.bm25TopK(sess, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(base.nonEmpty)
    assert(viaParquet === base)
  }

  test("hybrid_rrf is identical under parquet materialization") {
    val sess = sess2
    val base = Search.hybridRrf(spark, dir).collect().map(_.toSeq).toSeq
    val viaParquet = Search.hybridRrf(sess, dir).collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    assert(viaParquet === base)
  }

  // One parquet-mode session for the end-to-end tests: a separate
  // SparkSession (shared context, own conf) gets its own perDocCache entry,
  // so the frame really is re-materialized through the parquet path.
  private lazy val sess2 = {
    val s = spark.newSession()
    s.conf.set(Search.MaterializeKey, "parquet")
    s.conf.set(Search.ScratchDirKey,
      java.nio.file.Files.createTempDirectory("graft-scratch").toString)
    s
  }
}
