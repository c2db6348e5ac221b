package graft

import org.apache.spark.sql.DataFrame

import graft.operators._

/** Plan contracts: the scale-critical physical-plan properties the README
  * claims, asserted so a refactor can't silently regress them.
  * (Executed plans need an action first — AQE finalizes join strategies at
  * runtime — so each contract materializes to the noop sink, then asserts.)
  */
class PlanContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): String = {
    // execute THIS QueryExecution — a noop write runs a fresh one and
    // leaves df's plan un-finalized (static, isFinalPlan=false), so every
    // contract would silently assert on the pre-AQE plan (r11 find)
    val qe = df.queryExecution
    qe.toRdd.count()
    // an executed AdaptiveSparkPlan prints BOTH the final and the initial
    // plan; contracts assert on the FINAL section only (counting the
    // initial copy would double every exchange/join)
    qe.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q6: all predicates reach the parquet scan; only needed columns read") {
    val p = executedPlan(Relational.q6FilterAgg(spark, dir))
    assert(p.contains("PushedFilters"))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(p.contains(c), s"pushed filter on $c missing"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      "scan reads columns the query never uses")
  }

  test("q5: every dimension join is broadcast; no sort-merge join") {
    val p = executedPlan(Relational.q5NationRevenue(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4)
    assert(!p.contains("SortMergeJoin"),
      "a dimension join degraded to sort-merge")
  }

  test("q4: the EXISTS plans as a hash semi-join, never a cartesian") {
    val p = executedPlan(Relational.q4OrderPriority(spark, dir))
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the orderkey equi-key must drive a hash join")
  }

  test("knn: the query side is broadcast, the corpus is never shuffled pre-join") {
    val p = executedPlan(VectorOps.knnBruteforce(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the only Exchange allowed is the per-query window rank
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith(": +- Exchange"))
    assert(exchanges <= 1, s"unexpected extra shuffles:\n$p")
  }

  test("chunk_fixed is a pure narrow map: zero exchanges") {
    val p = executedPlan(Chunking.chunkFixed(spark, dir))
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("text ops read only the columns they use") {
    val p = executedPlan(TextOps.textTokens(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      "scan reads unused document columns")
  }

  test("native expressions appear in the plan (no HOF fallback)") {
    val p = executedPlan(TextOps.textFingerprint(spark, dir))
    assert(p.contains("graft_polyhash"))
    // dedup_ngram consumes the CACHED checkpointed shingle frame, so the
    // WordShingles kernel lives in the cache-BUILD plan (asserted here),
    // while the consumer plan must show the checkpoint reuse instead of
    // re-tokenizing.
    val docs = graft.sources.Tables.documents(spark, dir)
    val build = executedPlan(Dedup.repShinglesBuild(Dedup.normGroups(docs)))
    assert(build.contains("graft_word_shingles"))
    val q = executedPlan(Dedup.dedupNgram(spark, dir))
    assert(!q.contains("graft_word_shingles") && q.contains("Scan ExistingRDD"),
      "dedup_ngram must reuse the checkpointed shingle frame, not re-shingle")
  }

  test("ann_ivf: pairs form inside cells via an equi-join; no cartesian") {
    val plan = executedPlan(VectorOps.annIvf(spark, dir))
    assert(!plan.contains("CartesianProduct"), "candidate join degraded to cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "candidate join must be cell-keyed")
    // the pair dedup must shuffle only (id, id, score) rows, no embeddings
    plan.linesIterator.filter(_.contains("hashpartitioning(vec_id_a")).foreach(l =>
      assert(!l.contains("embedding"), "pair-dedup shuffle carries embeddings"))
  }

  test("ivf_build is a narrow assignment: no shuffle at all") {
    val plan = executedPlan(VectorOps.ivfBuild(spark, dir))
    assert(!plan.contains("Exchange"), "cell assignment must not shuffle")
  }

  test("multimodal resize/framesample and text_repetition are narrow: zero exchanges") {
    assert(!executedPlan(Multimodal.multimodalResize(spark, dir)).contains("Exchange"))
    assert(!executedPlan(Multimodal.multimodalFramesample(spark, dir)).contains("Exchange"))
    assert(!executedPlan(TextOps.textRepetition(spark, dir)).contains("Exchange"))
  }

  test("multimodal_phash is narrow; phash pairs form via bucket grouping, no cartesian") {
    assert(!executedPlan(Multimodal.multimodalPhash(spark, dir)).contains("Exchange"),
      "fingerprinting must not shuffle")
    val pairs = executedPlan(Multimodal.multimodalPhashPairs(spark, dir))
    assert(!pairs.contains("CartesianProduct") && !pairs.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay bucket-keyed")
  }

  test("decontam broadcasts the eval shingles; the training side is never built") {
    val p = executedPlan(Curation.curationDecontam(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    // the contamination join must build on the (small) eval side
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("curation_pack windows shard by source: no global single-partition sort") {
    val p = executedPlan(Curation.curationPack(spark, dir))
    assert(p.contains("hashpartitioning(source"),
      s"pack window must partition by source:\n$p")
  }


  test("dedup_embedding_lsh: fused sign-bit kernel, bucket-keyed pairs, no cartesian") {
    val p = executedPlan(Dedup.dedupEmbeddingLsh(spark, dir))
    assert(p.contains("graft_vec_sign_chunks"), "the fused VecSignChunks kernel is missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay bucket-keyed")
  }

  test("vec_pca is a narrow projection map: zero exchanges") {
    val plan = executedPlan(VectorOps.vecPca(spark, dir))
    assert(!plan.contains("Exchange"), s"PCA projection must not shuffle:\n$plan")
  }

  test("vec_pq is a narrow code-assignment map: zero exchanges") {
    val plan = executedPlan(VectorOps.vecPq(spark, dir))
    assert(!plan.contains("Exchange"), s"PQ code assignment must not shuffle:\n$plan")
    assert(plan.contains("graft_pq_codes"), "the fused PqCodes kernel is missing")
  }

  test("ann_pq / ann_ivfpq broadcast the query side and never shuffle the codes") {
    val p1 = executedPlan(VectorOps.annPq(spark, dir))
    assert(p1.contains("graft_pq_adc_score"), "ADC kernel missing")
    assert(p1.contains("BroadcastNestedLoopJoin") || p1.contains("BroadcastHashJoin"),
      "query side must broadcast")
    assert(!p1.contains("SortMergeJoin"), "code scan shuffled into a sort-merge join")
    val p2 = executedPlan(VectorOps.annIvfPq(spark, dir))
    assert(p2.contains("graft_pq_adc_score"), "ADC kernel missing")
    assert(p2.contains("BroadcastHashJoin"), "probed-cell join must broadcast the queries")
    assert(!p2.contains("SortMergeJoin"), "code scan shuffled into a sort-merge join")
  }

  test("ann_ivf_hier: fused two-level probe kernel; pairs stay cell-local") {
    // the multi-probe assignment is checkpointed (like ann_ivf), so the
    // kernel shows in the assignment plan, not the downstream pair plan
    val cents = IvfModel.centroids(spark, dir)
    val (supers, memberOf) = IvfModel.superModel(cents)
    val assignPlan = graft.sources.Tables.embeddings(spark, dir)
      .select(graft.functions.IvfProbesHier.column(
        org.apache.spark.sql.functions.col("embedding"),
        supers, cents, memberOf, VectorOps.SuperProbes, VectorOps.AssignProbes))
      .queryExecution.optimizedPlan.toString
    assert(assignPlan.contains("graft_ivf_probes_hier"), "IvfProbesHier kernel missing")
    val p = executedPlan(VectorOps.annIvfHier(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay cell-keyed")
  }

  test("dedup_substring: fused window-hash kernel; coverage window shards by doc") {
    // the window frame is checkpointed (one kernel pass for both
    // consumers), so the kernel shows in the window-stage plan, not the
    // downstream coverage plan
    val winPlan = graft.sources.Tables.documents(spark, dir)
      .select(graft.functions.WordWindowHashes.column(
        org.apache.spark.sql.functions.col("text"), Dedup.SubstringLen))
      .queryExecution.optimizedPlan.toString
    assert(winPlan.contains("graft_word_window_hashes"), "WordWindowHashes kernel missing")
    val p = executedPlan(Dedup.dedupSubstring(spark, dir))
    assert(p.contains("hashpartitioning(rep_id"),
      s"coverage window must partition by content id:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the duplicated-hash stage must stay hash-keyed")
  }

  test("curation_pack_global: per-row windows bucket-partitioned, one bounded global scan") {
    val p = executedPlan(Curation.curationPackGlobal(spark, dir))
    // pin the window's PARTITION SPEC (bucketed, never global): the
    // physical exchange may be legitimately absent in the final plan when
    // the checkpointed input is a single partition at this tiny SF
    assert(p.contains("windowspecdefinition(__b1"),
      s"doc-level window must partition by the id bucket:\n$p")
    // the only SinglePartition exchange feeds the bucket-of-buckets
    // cumulation (N/2²⁰ rows), never the doc-level frame. Count DISTINCT
    // plan_ids: an AQE query stage reused by two consumer branches prints
    // its subtree twice but executes once.
    val singles = """Exchange SinglePartition[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(singles <= 1, s"expected at most one bounded global scan, got $singles:\n$p")
  }
}
