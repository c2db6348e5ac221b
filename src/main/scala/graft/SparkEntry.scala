package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator appears in `queries`; each SQL-expressible one
  * has a DuckDB oracle in `oracleSql` with IDENTICAL output column names
  * (the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5NationRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"              -> Relational.q1Agg _,
    "q3_top_orders"       -> Relational.q3TopOrders _,
    "q5_nation_revenue"   -> Relational.q5NationRevenue _,
    "q6_filter_agg"       -> Relational.q6FilterAgg _,
    "q4_order_priority"   -> Relational.q4OrderPriority _,
    "q15_top_supplier"    -> Relational.q15TopSupplier _,
    "q_window_topk"       -> Relational.qWindowTopk _,
    "q_events_window"     -> Relational.qEventsWindow _,
    "q_events_sessionize" -> Relational.qEventsSessionize _,
    "q_events_enrich"     -> Relational.qEventsEnrich _,
    "q_events_sliding"    -> Relational.qEventsSliding _,
    "q_events_asof"       -> Relational.qEventsAsof _,
    "q_events_range_join" -> Relational.qEventsRangeJoin _,
    "q_events_funnel"     -> Relational.qEventsFunnel _,
    "q_events_retention"  -> Relational.qEventsRetention _,
    "q_events_anomaly"    -> Relational.qEventsAnomaly _,
    "q_events_percentiles" -> Relational.qEventsPercentiles _,
    "q_events_percentiles_approx" -> Relational.qEventsPercentilesApprox _,
    "q_events_dau_wau"    -> Relational.qEventsDauWau _,
    "q_events_dau_wau_approx" -> Relational.qEventsDauWauApprox _,
    "q_events_heavy_hitters" -> Relational.qEventsHeavyHitters _,
    "q_events_heavy_hitters_approx" -> Relational.qEventsHeavyHittersApprox _,
    "q_orders_growth"     -> Relational.qOrdersGrowth _,
    "q13_customer_distribution" -> Relational.q13CustomerDistribution _,
    "q18_large_orders"    -> Relational.q18LargeOrders _,
    "doc_normalize"       -> TextOps.docNormalize _,
    "text_tokens"         -> TextOps.textTokens _,
    "text_langid"         -> TextOps.textLangid _,
    "text_langid_confusion" -> TextOps.textLangidConfusion _,
    "text_quality"        -> TextOps.textQuality _,
    "text_fingerprint"    -> TextOps.textFingerprint _,
    "text_vocab"          -> TextOps.textVocab _,
    "text_surprisal"      -> TextOps.textSurprisal _,
    "text_bpe_pairs"      -> TextOps.textBpePairs _,
    "text_bpe_train"      -> TextOps.textBpeTrain _,
    "text_repetition"     -> TextOps.textRepetition _,
    "text_tfidf"          -> TextOps.textTfidf _,
    "corpus_stats"        -> TextOps.corpusStats _,
    "text_redact"         -> TextOps.textRedact _,
    "text_entropy"        -> TextOps.textEntropy _,
    "chunk_fixed"         -> Chunking.chunkFixed _,
    "chunk_tokens"        -> Chunking.chunkTokens _,
    "chunk_boilerplate"   -> Chunking.chunkBoilerplate _,
    "chunk_sentences"     -> Chunking.chunkSentences _,
    "chunk_headings"      -> Chunking.chunkHeadings _,
    "chunk_stats"         -> Chunking.chunkStats _,
    "chunk_histogram"     -> Chunking.chunkHistogram _,
    "dedup_exact"         -> Dedup.dedupExact _,
    "dedup_ngram"         -> Dedup.dedupNgram _,
    "dedup_clusters"      -> Dedup.dedupClusters _,
    "dedup_clusters_lsh"  -> Dedup.dedupClustersLsh _,
    "dedup_cluster_stats" -> Dedup.dedupClusterStats _,
    "dedup_minhash"       -> Dedup.dedupMinhash _,
    "dedup_verified"      -> Dedup.dedupVerified _,
    "dedup_recall"        -> Dedup.dedupRecall _,
    "dedup_simhash"       -> Dedup.dedupSimhash _,
    "dedup_ngram_grouped"    -> Dedup.dedupNgramGrouped _,
    "dedup_minhash_grouped"  -> Dedup.dedupMinhashGrouped _,
    "dedup_verified_grouped" -> Dedup.dedupVerifiedGrouped _,
    "dedup_simhash_grouped"  -> Dedup.dedupSimhashGrouped _,
    "dedup_substring"     -> Dedup.dedupSubstring _,
    "dedup_substring_spans" -> Dedup.dedupSubstringSpans _,
    "dedup_embedding"     -> Dedup.dedupEmbedding _,
    "dedup_embedding_lsh" -> Dedup.dedupEmbeddingLsh _,
    "dedup_semantic"      -> VectorOps.dedupSemantic _,
    "knn_bruteforce"      -> VectorOps.knnBruteforce _,
    "ann_bruteforce"      -> VectorOps.annBruteforce _,
    "ivf_build"           -> VectorOps.ivfBuild _,
    "ivf_search"          -> VectorOps.ivfSearch _,
    "ann_ivf"             -> VectorOps.annIvf _,
    "ann_ivf_dial"        -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      VectorOps.annIvf(s, d, VectorOps.DialedAssignProbes)),
    "ann_ivf_hier"        -> VectorOps.annIvfHier _,
    "ann_ivf_hier_dial"   -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      VectorOps.annIvfHier(s, d, VectorOps.DialedAssignProbes,
        VectorOps.DialedSuperProbes)),
    "ivf_build_hier"      -> VectorOps.ivfBuildHier _,
    "ivf_hier_agreement"  -> VectorOps.ivfHierAgreement _,
    "ann_recall"          -> VectorOps.annRecall _,
    "ann_hier_recall"     -> VectorOps.annHierRecall _,
    "vec_quantize"        -> VectorOps.vecQuantize _,
    "vec_pca"             -> VectorOps.vecPca _,
    "vec_outliers"        -> VectorOps.vecOutliers _,
    "cluster_terms"       -> VectorOps.clusterTerms _,
    "vec_norm_stats"      -> VectorOps.vecNormStats _,
    "vec_pq"              -> VectorOps.vecPq _,
    "ann_pq"              -> VectorOps.annPq _,
    "ann_ivfpq"           -> VectorOps.annIvfPq _,
    "ann_ivfpq_rerank"    -> VectorOps.annIvfPqRerank _,
    "ivfpq_recall"        -> VectorOps.ivfpqRecall _,
    "ivfpq_rerank_recall" -> VectorOps.ivfpqRerankRecall _,
    "pq_recall"           -> VectorOps.pqRecall _,
    "bm25_topk"           -> Search.bm25TopK _,
    "hybrid_rrf"          -> Search.hybridRrf _,
    "eval_recall"         -> Search.evalRecall _,
    "eval_compare"        -> Search.evalCompare _,
    "search_compare"      -> Search.searchCompare _,
    "multimodal_meta"     -> Multimodal.multimodalMeta _,
    "multimodal_resize"   -> Multimodal.multimodalResize _,
    "multimodal_framesample" -> Multimodal.multimodalFramesample _,
    "multimodal_audiowindows" -> Multimodal.multimodalAudiowindows _,
    "multimodal_phash"    -> Multimodal.multimodalPhash _,
    "multimodal_phash_pairs" -> Multimodal.multimodalPhashPairs _,
    "multimodal_phash_clusters" -> Multimodal.multimodalPhashClusters _,
    "chunk_preview"       -> Chunking.chunkPreview _,
    "search_preview"      -> Search.searchPreview _,
    "search_highlights"   -> Search.searchHighlights _,
    "pipeline_filter"     -> Curation.pipelineFilter _,
    "curation_sample"     -> Curation.curationSample _,
    "curation_split"      -> Curation.curationSplit _,
    "curation_budget"     -> Curation.curationBudget _,
    "curation_decontam"   -> Curation.curationDecontam _,
    "curation_decontam_bloom" -> Curation.curationDecontamBloom _,
    "curation_mix"        -> Curation.curationMix _,
    "curation_pack"       -> Curation.curationPack _,
    "curation_pack_global" -> Curation.curationPackGlobal _,
    "curation_report"     -> Curation.curationReport _,
    "curation_weight"     -> Curation.curationWeight _,
    "curation_crossmodal" -> Curation.curationCrossmodal _,
  )

  /** DuckDB CTE block computing a per-query ranked neighbor list, mirroring
    * [[graft.operators.VectorOps.topK]] exactly (6dp-rounded score ranking,
    * id tiebreak). CTE names are prefixed so two retrievers can coexist in
    * one oracle query (eval_compare).
    */
  private def rankedCtes(p: String, qFilter: String, metric: String): String = {
    val dotExpr =
      "list_sum(list_transform(list_zip(q.q_emb, e.embedding), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
    // `+ 0.0` normalizes IEEE -0.0 to +0.0: DuckDB's round preserves the
    // sign of a tiny negative score, Spark's (BigDecimal) never emits
    // -0.0 — without the normalization a near-zero dot/cosine (e.g.
    // against a denormal-scale vector) hash-mismatches as '-0.0' vs '0.0'.
    val score = metric match {
      case "dot" => s"round($dotExpr, 6) + 0.0"
      case _     => s"round($dotExpr / (q.q_nrm * e.nrm), 6) + 0.0"
    }
    s"""${p}n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |${p}q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM ${p}n WHERE $qFilter),
       |${p}p AS (SELECT q.q_id, e.vec_id AS neighbor_id, $score AS score
       |      FROM ${p}q q, ${p}n e WHERE e.vec_id <> q.q_id),
       |${p}r AS (SELECT q_id, neighbor_id, score,
       |        row_number() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS rk
       |      FROM ${p}p)""".stripMargin
  }

  /** DuckDB CTE block producing the full BM25 ranking `bmr(rk, doc_id,
    * score)`, mirroring [[graft.operators.Search.bm25Ranked]].
    */
  private def bm25Ctes: String = {
    val qlist = graft.operators.Search.QueryText.toLowerCase.split("\\s+")
      .map(t => s"'$t'").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, UNNEST(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |    ELSE string_split_regex(lower(trim(text)), '\\s+') END) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs,
       |            CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |dft AS (SELECT term, count(*) AS df
       |        FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
       |idfr AS (SELECT term,
       |           ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) AS idf_raw
       |         FROM dft, stats),
       |ai AS (SELECT sum(idf_raw) / CAST(count(*) AS DOUBLE) AS avg_idf FROM idfr),
       |idf AS (SELECT term, CASE WHEN idf_raw < 0 THEN 0.25 * avg_idf ELSE idf_raw END AS idf
       |        FROM idfr, ai WHERE term IN ($qlist)),
       |tf AS (SELECT doc_id, term, count(*) AS f FROM toks WHERE term IN ($qlist) GROUP BY 1, 2),
       |sc AS (SELECT tf.doc_id,
       |         sum(idf.idf * (CAST(tf.f AS DOUBLE) * 2.5) /
       |             (CAST(tf.f AS DOUBLE) + 1.5 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))) AS s
       |       FROM tf JOIN idf ON tf.term = idf.term JOIN dl ON tf.doc_id = dl.doc_id, stats
       |       GROUP BY 1),
       |bmr AS (SELECT round(s, 6) AS score, doc_id,
       |          row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rk FROM sc)""".stripMargin
  }

  /** Gold-set CTE (q_id → expected_id) mirroring [[graft.operators.Search]]. */
  private def goldCte: String =
    """g AS (SELECT q.vec_id AS q_id, min(o.vec_id) AS expected_id
      |      FROM embeddings q JOIN embeddings o
      |        ON o.label = q.label AND o.vec_id <> q.vec_id
      |      WHERE q.vec_id BETWEEN 0 AND 49 GROUP BY 1)""".stripMargin

  /** Driver-contract surface: DuckDB-dialect oracle SQL per query at the
    * default verify scale. The IVF oracles embed fitted centroid literals
    * (data-dependent), so Verify threads its actual (session, dir) through
    * [[oracleSqlFor]] explicitly; this no-arg form exists for the contract
    * and uses the active session + the driver's verify dir.
    */
  def oracleSql: Map[String, String] =
    oracleSqlFor(SparkSession.active, "/root/testdata/sf0.01")

  /** Queries deliberately WITHOUT a DuckDB oracle (driver falls back to its
    * weaker rows-only check). Membership is a named design decision — each
    * entry must document WHY no SQL oracle can exist, and ContractSpec pins
    * `queries == oracles ∪ rowsOnlyQueries` so nothing lands here silently.
    *
    *  - q_events_percentiles_approx: the result is a Greenwald-Khanna sketch
    *    query; no SQL engine replays Spark's sketch bit-for-bit. The
    *    approximation is pinned instead by RelationalSpec's rank-error bound
    *    against the exact operator (|CDF(approx_p) − p| ≤ 1e-3).
    *  - q_events_dau_wau_approx: mergeable per-day HLL sketches
    *    (DataSketches); register hashing is engine-specific, so no SQL
    *    engine reproduces the exact estimates. Pinned by RelationalSpec's
    *    relative-error bound against the exact q_events_dau_wau
    *    (≤ 3%; lgK=14 → rsd ≈ 0.8%).
    *  - q_events_heavy_hitters_approx: mergeable frequent-items sketches
    *    (DataSketches approx_top_k_*); eviction order and tie order inside
    *    the sketch are engine-specific. Pinned by RelationalSpec: exact
    *    (day, user, count) agreement with q_events_heavy_hitters at test SF
    *    (65536 tracked slots ≥ distinct users per window at every gate SF
    *    ⇒ the sketch never evicts and is provably exact), plus the
    *    saturated NO_FALSE_POSITIVES bound on a synthetic skewed stream
    *    and VerifyApprox's regime-aware check (see the operator scaladoc).
    *  - curation_decontam_bloom: the eval set folds into a Bloom filter
    *    (bloom_filter_agg) whose bit layout is engine-specific; DuckDB
    *    cannot replay the probe. Pinned by CurationSpec: one-sided
    *    dominance (no false negatives) vs curation_decontam plus exact
    *    agreement at test SF, where the 4 MiB filter's FPP is ~0.
    */
  val rowsOnlyQueries: Set[String] =
    Set("q_events_percentiles_approx", "q_events_dau_wau_approx",
      "q_events_heavy_hitters_approx", "curation_decontam_bloom")

  /** DuckDB-dialect oracle SQL per query (same table names as the parquet
    * files; same output column names as the Spark result), for the
    * embeddings fit under `dir` — the centroid literals in the IVF oracles
    * come from the same cached fit the queries ran with.
    */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] = {
    val ivfCents = IvfModel.centroids(spark, dir)
    val (ivfSupers, ivfMemberOf) = IvfModel.superModel(ivfCents)
    val pqBooks = PqModel.codebooks(spark, dir)
    val pcaM = PcaModel.model(spark, dir)
    Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(5,2))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(5,2)) * CAST(1 + CAST(l_tax AS DECIMAL(5,2)) AS DECIMAL(5,2))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(5,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(5,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(5,2))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT max(total_rev) AS mx FROM rev)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey, mx
        |WHERE total_rev = mx.mx
        |ORDER BY s_suppkey""".stripMargin,

    "q6_filter_agg" ->
      """SELECT
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(5,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin,

    "q_window_topk" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part)
        |WHERE rk <= 3""".stripMargin,

    "q_events_window" ->
      """SELECT
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(25,10))), 6) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q_events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM s
        |GROUP BY user_id, session_id""".stripMargin,

    "q_events_sliding" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS win_start, event_type, value FROM events)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(25,10))), 6) AS DOUBLE) AS sum_value
        |FROM w
        |GROUP BY win_start, event_type""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t
        |        AND epoch_us(e.ts) <= v.t + 86400000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t
        |        AND epoch_us(e.ts) <= c.t + 86400000000 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM v) AS n_view,
        |             (SELECT count(*) FROM c) AS n_click,
        |             (SELECT count(*) FROM p) AS n_purchase)
        |SELECT n_view, n_click, n_purchase,
        |  CASE WHEN n_view = 0 THEN NULL
        |       ELSE round(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE), 6) END AS view_to_click,
        |  CASE WHEN n_click = 0 THEN NULL
        |       ELSE round(CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE), 6) END AS click_to_purchase
        |FROM n""".stripMargin,

    "q_events_retention" ->
      """WITH co AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |            FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(co.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', co.cohort_day, act.day) AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM act JOIN co ON act.user_id = co.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_events_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sm,
        |        CAST(sum(c * c) AS BIGINT) AS sq
        |      FROM d GROUP BY 1),
        |j AS (SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
        |        CAST(d.c AS BIGINT) AS n_events,
        |        CAST(s.sm AS DOUBLE) / s.n AS mean,
        |        sqrt(CAST(s.sq AS DOUBLE) / s.n -
        |             (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n)) AS std
        |      FROM d JOIN s ON d.event_type = s.event_type)
        |SELECT event_type, day, n_events,
        |  CASE WHEN std = 0 THEN 0.0
        |       ELSE round((CAST(n_events AS DOUBLE) - mean) / std, 6) END AS z,
        |  CASE WHEN std = 0 THEN FALSE
        |       ELSE abs((CAST(n_events AS DOUBLE) - mean) / std) > 2.0 END AS is_anomaly
        |FROM j""".stripMargin,

    "q_events_percentiles" ->
      """WITH bv AS (SELECT event_type, value, count(*) AS c FROM events
        |            WHERE value IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT event_type, value, c,
        |          CAST(sum(c) OVER (PARTITION BY event_type ORDER BY value
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
        |        FROM bv),
        |c2 AS (SELECT event_type, value, c, cum_end, cum_end - c AS cum_start,
        |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
        |       FROM cum),
        |c3 AS (SELECT *, CAST(cnt - 1 AS DOUBLE) * 0.50 AS k50,
        |         CAST(cnt - 1 AS DOUBLE) * 0.95 AS k95,
        |         CAST(cnt - 1 AS DOUBLE) * 0.99 AS k99
        |       FROM c2),
        |g AS (SELECT event_type, max(cnt) AS n_events,
        |        min(value) AS v_min, max(value) AS v_max,
        |        max(CASE WHEN cum_start <= floor(k50) AND floor(k50) < cum_end THEN value END) AS lo50,
        |        max(CASE WHEN cum_start <= ceil(k50) AND ceil(k50) < cum_end THEN value END) AS hi50,
        |        max(k50) AS kk50,
        |        max(CASE WHEN cum_start <= floor(k95) AND floor(k95) < cum_end THEN value END) AS lo95,
        |        max(CASE WHEN cum_start <= ceil(k95) AND ceil(k95) < cum_end THEN value END) AS hi95,
        |        max(k95) AS kk95,
        |        max(CASE WHEN cum_start <= floor(k99) AND floor(k99) < cum_end THEN value END) AS lo99,
        |        max(CASE WHEN cum_start <= ceil(k99) AND ceil(k99) < cum_end THEN value END) AS hi99,
        |        max(k99) AS kk99
        |      FROM c3 GROUP BY 1)
        |-- `+ 0.0` maps an IEEE -0.0 min/max to +0.0: Spark's grouping
        |-- normalizes -0.0 keys to 0.0 and its round never emits -0.0,
        |-- DuckDB's representative value and round both keep the sign
        |SELECT event_type, n_events, round(v_min, 6) + 0.0 AS v_min,
        |  round(v_max, 6) + 0.0 AS v_max,
        |  round(lo50 + (hi50 - lo50) * (kk50 - floor(kk50)), 6) + 0.0 AS p50,
        |  round(lo95 + (hi95 - lo95) * (kk95 - floor(kk95)), 6) + 0.0 AS p95,
        |  round(lo99 + (hi99 - lo99) * (kk99 - floor(kk99)), 6) + 0.0 AS p99
        |FROM g""".stripMargin,

    "q13_customer_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS n_customers
        |FROM pc GROUP BY c_count""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) >= 300)
        |SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q_orders_growth" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |g AS (SELECT month, revenue, n_orders,
        |        lag(revenue) OVER (ORDER BY month) AS prev FROM m)
        |SELECT month, revenue, n_orders,
        |  round((revenue - prev) / prev, 6) AS mom_growth
        |FROM g""".stripMargin,

    "q_events_dau_wau" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM act GROUP BY 1),
        |wau AS (SELECT day, count(*) AS wau FROM (
        |          SELECT DISTINCT user_id, day + CAST(t.k AS INT) AS day
        |          FROM act, UNNEST(range(0, 7)) AS t(k))
        |        GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,

    "q_events_heavy_hitters" ->
      s"""WITH pd AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT pd.day + CAST(t.k AS INT) AS day, user_id,
        |    CAST(SUM(c) AS BIGINT) AS n_events
        |  FROM pd, UNNEST(range(0, 7)) AS t(k) GROUP BY 1, 2),
        |rk AS (
        |  SELECT tr.day, user_id, n_events,
        |    row_number() OVER (PARTITION BY tr.day
        |      ORDER BY n_events DESC, user_id) AS rank
        |  FROM tr JOIN (SELECT DISTINCT day FROM pd) rd ON tr.day = rd.day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rank AS BIGINT) AS rank,
        |  user_id, n_events
        |FROM rk WHERE rank <= ${Relational.HeavyHittersK}""".stripMargin,

    "q_events_asof" ->
      """WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |r AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT l.event_id, l.user_id, l.ts,
        |        r.event_id AS match_event_id, r.ts AS m_ts, r.value AS match_value,
        |        row_number() OVER (PARTITION BY l.event_id
        |          ORDER BY epoch_us(r.ts) DESC NULLS LAST, r.event_id DESC NULLS LAST) AS rk
        |      FROM l LEFT JOIN r
        |        ON r.user_id = l.user_id AND epoch_us(r.ts) <= epoch_us(l.ts))
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  match_event_id, strftime(m_ts, '%Y-%m-%d %H:%M:%S') AS match_ts_s, match_value
        |FROM j WHERE rk = 1""".stripMargin,

    "q_events_range_join" ->
      """WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |r AS (SELECT ts, user_id, value FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT l.event_id, l.user_id, l.ts,
        |        -- count matched purchase ROWS (r.ts is never null on a
        |        -- match): count(r.value) would silently skip purchases
        |        -- whose value is NULL, which the query counts
        |        count(r.ts) AS n_recent_purchases,
        |        sum(r.value) AS sv
        |      FROM l LEFT JOIN r
        |        ON r.user_id = l.user_id
        |       AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - 3600000000 AND epoch_us(l.ts)
        |      GROUP BY 1, 2, 3)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  n_recent_purchases, round(COALESCE(sv, 0.0), 6) AS sum_recent_value
        |FROM j""".stripMargin,

    "q_events_enrich" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    -- mirror the query's try-parse degradation: malformed JSON, a
        |    -- missing key, or a non-numeric key value all land in the
        |    -- NULL bucket instead of erroring the whole query
        |    CASE WHEN json_valid(props)
        |         THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type,
        |  k // 10 AS k_decile,
        |  count(*) AS n_events,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(25,10))), 6) AS DOUBLE) AS sum_value,
        |  min(k) AS k_min,
        |  max(k) AS k_max
        |FROM e
        |GROUP BY 1, 2""".stripMargin,

    "doc_normalize" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    concat_ws(' | ',
        |      CASE WHEN trim(CAST(doc_id AS VARCHAR)) = '' THEN NULL ELSE CAST(doc_id AS VARCHAR) END,
        |      CASE WHEN trim(text) = '' THEN NULL ELSE text END,
        |      CASE WHEN trim(lang) = '' THEN NULL ELSE lang END,
        |      CASE WHEN trim(source) = '' THEN NULL ELSE source END,
        |      CASE WHEN trim(CAST(n_chars AS VARCHAR)) = '' THEN NULL ELSE CAST(n_chars AS VARCHAR) END
        |    ) AS row_text
        |  FROM documents)
        |SELECT doc_id, row_text FROM j WHERE trim(row_text) <> ''""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
        |  length(text) AS n_chars
        |FROM documents""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS score_de,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS score_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','los','de','es','y','un'], x))) AS score_es,
        |    len(list_filter(toks, x -> list_contains(['le','les','et','est','un','une','de'], x))) AS score_fr
        |  FROM t)
        |SELECT doc_id, score_de, score_en, score_es, score_fr,
        |  CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'unknown'
        |       WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
        |       WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
        |       WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM s""".stripMargin,

    "text_langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS score_de,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS score_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','los','de','es','y','un'], x))) AS score_es,
        |    len(list_filter(toks, x -> list_contains(['le','les','et','est','un','une','de'], x))) AS score_fr
        |  FROM t),
        |l AS (
        |  SELECT doc_id,
        |    CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'unknown'
        |         WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
        |         WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
        |         WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
        |         ELSE 'fr' END AS pred_lang
        |  FROM s),
        |cm AS (SELECT d.lang, l.pred_lang, count(*) AS n_docs
        |       FROM documents d JOIN l ON d.doc_id = l.doc_id GROUP BY 1, 2)
        |SELECT lang, pred_lang, n_docs,
        |  round(CAST(n_docs AS DOUBLE) /
        |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
        |FROM cm""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
        |    len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS punct,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS stops,
        |    list_sum(list_transform(toks, x -> length(x))) AS sum_wl
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  round(CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
        |  round(CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
        |  round(CAST(sum_wl AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS avg_word_len,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
        |      + 0.3 * (1.0 - least(1.0, CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0))
        |      + 0.3 * least(1.0, CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0), 6) AS quality
        |FROM f WHERE n_tokens > 0""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) < 1 THEN 0
        |       ELSE list_reduce(list_transform(range(1, length(text) + 1),
        |              i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |              (a, b) -> (a * 31 + b) % 1000000007) END AS fp,
        |  CASE WHEN length(lower(trim(text))) < 1 THEN 0
        |       ELSE list_reduce(list_transform(range(1, length(lower(trim(text))) + 1),
        |              i -> CAST(ord(substr(lower(trim(text)), CAST(i AS INT), 1)) AS BIGINT)),
        |              (a, b) -> (a * 31 + b) % 1000000007) END AS fp_norm
        |FROM documents""".stripMargin,

    "text_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE string_split_regex(lower(trim(text)), '\s+') END) AS term
        |  FROM documents),
        |pd AS (SELECT doc_id, term, count(*) AS f FROM toks GROUP BY 1, 2),
        |v AS (SELECT term, sum(f) AS tf, count(*) AS df FROM pd GROUP BY 1),
        |r AS (SELECT term, CAST(tf AS BIGINT) AS tf, df,
        |        row_number() OVER (ORDER BY tf DESC, term) AS rk FROM v)
        |SELECT rk, term, tf, df FROM r WHERE rk <= 100""".stripMargin,

    "text_surprisal" -> graft.operators.TextOps.surprisalOracleSql,

    "text_tfidf" -> graft.operators.TextOps.tfidfOracleSql,

    "corpus_stats" -> graft.operators.TextOps.corpusStatsOracleSql,

    "text_bpe_pairs" -> graft.operators.TextOps.bpePairsOracleSql,

    "text_bpe_train" -> graft.operators.TextOps.bpeTrainOracleSql,

    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, substr(text, CAST(t.i AS INT), 1) AS ch
        |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)),
        |f AS (SELECT doc_id, ch, count(*) AS c FROM c GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
        |        CAST(count(*) AS BIGINT) AS n_distinct_chars
        |      FROM f GROUP BY 1),
        |h AS (SELECT f.doc_id,
        |        log2(any_value(n.n)) - sum(CAST(f.c AS DOUBLE) * log2(CAST(f.c AS DOUBLE))) / any_value(n.n) AS ent
        |      FROM f JOIN n ON f.doc_id = n.doc_id
        |      GROUP BY 1)
        |SELECT h.doc_id, n.n_distinct_chars, round(h.ent, 6) AS entropy_bits
        |FROM h JOIN n ON h.doc_id = n.doc_id""".stripMargin,

    "text_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g') AS redacted
        |FROM documents""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(greatest(0, len(toks) - 2) AS BIGINT) AS n_ngrams,
        |    CAST(len(list_distinct(
        |      CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(toks) - 1), i ->
        |             toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)]) END)) AS BIGINT) AS n_distinct
        |  FROM t)
        |SELECT doc_id, n_ngrams, n_distinct,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE), 6) AS rep_ratio
        |FROM g WHERE n_ngrams > 0""".stripMargin,

    "chunk_fixed" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |e AS (SELECT doc_id, text, t.j AS j
        |      FROM d, UNNEST(range(CASE WHEN n <= 100 THEN 1 ELSE 1 + (n - 21) // 80 END)) AS t(j))
        |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR) AS chunk_id,
        |  doc_id, j,
        |  substr(text, CAST(j * 80 + 1 AS INT), 100) AS chunk,
        |  length(substr(text, CAST(j * 80 + 1 AS INT), 100)) AS chunk_len
        |FROM e""".stripMargin,

    "chunk_tokens" -> graft.operators.Chunking.chunkTokensOracleSql,

    "chunk_boilerplate" -> graft.operators.Chunking.chunkBoilerplateOracleSql,

    "chunk_sentences" -> graft.operators.Chunking.chunkSentencesOracleSql,

    "chunk_headings" -> graft.operators.Chunking.chunkHeadingsOracleSql,

    "chunk_stats" ->
      """WITH d AS (SELECT doc_id, source, text, length(text) AS n FROM documents),
        |c AS (SELECT source, length(substr(text, CAST(t.j * 80 + 1 AS INT), 100)) AS len
        |      FROM d, UNNEST(range(CASE WHEN n <= 100 THEN 1 ELSE 1 + (n - 21) // 80 END)) AS t(j)),
        |r AS (SELECT source, len,
        |        row_number() OVER (PARTITION BY source ORDER BY len) AS rn,
        |        count(*) OVER (PARTITION BY source) AS cnt
        |      FROM c),
        |g AS (SELECT source, count(*) AS n_chunks, min(len) AS len_min, max(len) AS len_max,
        |        CAST(sum(len) AS DOUBLE) / count(*) AS len_avg,
        |        max(CASE WHEN CAST(rn - 1 AS DOUBLE) = floor(CAST(cnt - 1 AS DOUBLE) * 0.95) THEN len END) AS lo,
        |        max(CASE WHEN CAST(rn - 1 AS DOUBLE) = ceil(CAST(cnt - 1 AS DOUBLE) * 0.95) THEN len END) AS hi,
        |        max(CAST(cnt - 1 AS DOUBLE) * 0.95) AS kk
        |      FROM r GROUP BY source)
        |SELECT source, n_chunks, len_min, len_max, len_avg,
        |  lo + (hi - lo) * (kk - floor(kk)) AS len_p95
        |FROM g""".stripMargin,

    "chunk_histogram" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |c AS (SELECT length(substr(text, CAST(t.j * 80 + 1 AS INT), 100)) AS len
        |      FROM d, UNNEST(range(CASE WHEN n <= 100 THEN 1 ELSE 1 + (n - 21) // 80 END)) AS t(j)),
        |ext AS (SELECT min(len) AS vmin, max(len) AS vmax,
        |          greatest(1, (max(len) - min(len) + 19) // 20) AS step FROM c),
        |cnts AS (SELECT CASE WHEN ext.vmin = ext.vmax THEN 0
        |                     WHEN len = ext.vmax THEN 19
        |                     ELSE least(19, (len - ext.vmin) // ext.step) END AS bin, count(*) AS n
        |         FROM c, ext GROUP BY 1),
        |bins AS (SELECT t.b AS bin, ext.vmin, ext.vmax, ext.step
        |         FROM UNNEST(range(20)) AS t(b), ext
        |         WHERE ext.vmin <> ext.vmax OR t.b = 0)
        |SELECT bins.bin,
        |  bins.vmin + bins.bin * bins.step AS lo,
        |  CASE WHEN bins.vmin = bins.vmax THEN bins.vmax
        |       WHEN bins.bin = 19 THEN bins.vmax
        |       ELSE bins.vmin + (bins.bin + 1) * bins.step END AS hi,
        |  COALESCE(cnts.n, 0) AS n
        |FROM bins LEFT JOIN cnts ON bins.bin = cnts.bin""".stripMargin,

    "dedup_exact" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |g AS (SELECT norm, min(doc_id) AS keep_id, count(*) AS n_docs FROM n GROUP BY norm)
        |SELECT
        |  CASE WHEN length(norm) < 1 THEN 0
        |       ELSE list_reduce(list_transform(range(1, length(norm) + 1),
        |              i -> CAST(ord(substr(norm, CAST(i AS INT), 1)) AS BIGINT)),
        |              (a, b) -> (a * 31 + b) % 1000000007) END AS fp,
        |  keep_id, n_docs
        |FROM g""".stripMargin,

    "dedup_ngram" -> graft.operators.Dedup.ngramOracleSql,
    "dedup_ngram_grouped" -> graft.operators.Dedup.ngramGroupedOracleSql,
    "dedup_minhash_grouped" -> graft.operators.Dedup.minhashGroupedOracleSql,
    "dedup_verified_grouped" -> graft.operators.Dedup.verifiedGroupedOracleSql,
    "dedup_simhash_grouped" -> graft.operators.Dedup.simhashGroupedOracleSql,

    "dedup_clusters" -> graft.operators.Dedup.clustersOracleSql,
    "dedup_clusters_lsh" -> graft.operators.Dedup.clustersLshOracleSql,

    "dedup_cluster_stats" -> graft.operators.Dedup.clusterStatsOracleSql,

    "dedup_minhash" -> graft.operators.Dedup.minhashOracleSql,

    "dedup_verified" -> graft.operators.Dedup.verifiedOracleSql,
    "dedup_recall" -> graft.operators.Dedup.dedupRecallOracleSql,

    // IVF family: centroids are fitted deterministically (bounded sample,
    // canonical Lloyd's) and embedded as literals, so these are exact
    // oracles, not rows-only checks.
    "ivf_build" -> graft.operators.VectorOps.ivfBuildOracleSql(ivfCents),
    "ivf_search" -> graft.operators.VectorOps.ivfSearchOracleSql(ivfCents),
    "ann_ivf" -> graft.operators.VectorOps.annIvfOracleSql(ivfCents),
    "ann_ivf_dial" -> graft.operators.VectorOps.annIvfOracleSql(ivfCents,
      graft.operators.VectorOps.DialedAssignProbes),
    "dedup_semantic" -> graft.operators.VectorOps.dedupSemanticOracleSql(ivfCents),
    "ann_ivf_hier" -> graft.operators.VectorOps.annIvfHierOracleSql(
      ivfCents, ivfSupers, ivfMemberOf),
    "ann_ivf_hier_dial" -> graft.operators.VectorOps.annIvfHierOracleSql(
      ivfCents, ivfSupers, ivfMemberOf,
      graft.operators.VectorOps.DialedAssignProbes,
      graft.operators.VectorOps.DialedSuperProbes),
    "ivf_build_hier" -> graft.operators.VectorOps.ivfBuildHierOracleSql(
      ivfCents, ivfSupers, ivfMemberOf),
    "ivf_hier_agreement" -> graft.operators.VectorOps.ivfHierAgreementOracleSql(
      ivfCents, ivfSupers, ivfMemberOf),
    "ann_recall" -> graft.operators.VectorOps.annRecallOracleSql(ivfCents),
    "ann_hier_recall" -> graft.operators.VectorOps.annHierRecallOracleSql(
      ivfCents, ivfSupers, ivfMemberOf),
    "vec_pq" -> graft.operators.VectorOps.vecPqOracleSql(pqBooks),
    "ann_pq" -> graft.operators.VectorOps.annPqOracleSql(pqBooks),
    "ann_ivfpq" -> graft.operators.VectorOps.annIvfPqOracleSql(ivfCents, pqBooks),
    "ann_ivfpq_rerank" ->
      graft.operators.VectorOps.annIvfPqRerankOracleSql(ivfCents, pqBooks),
    "ivfpq_recall" -> graft.operators.VectorOps.ivfpqRecallOracleSql(ivfCents, pqBooks),
    "ivfpq_rerank_recall" ->
      graft.operators.VectorOps.ivfpqRerankRecallOracleSql(ivfCents, pqBooks),
    "pq_recall" -> graft.operators.VectorOps.pqRecallOracleSql(pqBooks),
    "vec_pca" -> graft.operators.VectorOps.vecPcaOracleSql(pcaM),
    "cluster_terms" -> graft.operators.VectorOps.clusterTermsOracleSql(ivfCents),
    "vec_outliers" -> graft.operators.VectorOps.vecOutliersOracleSql(ivfCents),

    "curation_crossmodal" ->
      s"""WITH ${graft.operators.VectorOps.vecOutliersCtes(ivfCents)},
         |qt AS (
         |  SELECT doc_id, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks
         |  FROM documents),
         |qf AS (
         |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
         |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS stops
         |  FROM qt),
         |q AS (
         |  SELECT doc_id,
         |    round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
         |        + 0.3 * (1.0 - least(1.0, CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0))
         |        + 0.3 * least(1.0, CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0), 6) AS quality
         |  FROM qf WHERE n_tokens > 0)
         |SELECT q.doc_id, q.quality, vo.z, vo.is_outlier,
         |  q.quality >= 0.75 AND NOT vo.is_outlier AS keep
         |FROM q JOIN vo ON q.doc_id = vo.vec_id""".stripMargin,

    "dedup_simhash" -> graft.operators.Dedup.simhashOracleSql,

    "dedup_substring" -> graft.operators.Dedup.substringOracleSql,

    "dedup_substring_spans" -> graft.operators.Dedup.substringSpansOracleSql,

    "dedup_embedding_lsh" -> graft.operators.Dedup.embeddingLshOracleSql(
      graft.operators.Dedup.embeddingDim(spark, dir)),

    "dedup_embedding" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT vec_id_a, vec_id_b, round(c, 6) AS cos_sim
        |FROM p WHERE c >= 0.35""".stripMargin,

    "knn_bruteforce" ->
      s"""WITH ${rankedCtes("", "vec_id BETWEEN 0 AND 9", "cos")}
         |SELECT q_id, rk, neighbor_id, score FROM r WHERE rk <= 5""".stripMargin,

    "ann_bruteforce" ->
      s"""WITH ${rankedCtes("", "vec_id BETWEEN 0 AND 9", "dot")}
         |SELECT q_id, rk, neighbor_id, score FROM r WHERE rk <= 5""".stripMargin,

    "vec_norm_stats" -> graft.operators.VectorOps.vecNormStatsOracleSql,

    "vec_quantize" ->
      """WITH d AS (
        |  SELECT vec_id,
        |    UNNEST(range(len(embedding))) AS dim,
        |    UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        |  FROM embeddings),
        |r AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM d GROUP BY 1),
        |q AS (SELECT vec_id, x,
        |        CASE WHEN hi = lo THEN lo
        |             ELSE round((x - lo) / (hi - lo) * 255, 0) / 255 * (hi - lo) + lo
        |        END AS deq
        |      FROM d JOIN r ON d.dim = r.dim)
        |SELECT vec_id,
        |  round(sqrt(sum((x - deq) * (x - deq))), 6) AS err_l2,
        |  round(max(abs(x - deq)), 6) AS max_abs_err
        |FROM q GROUP BY vec_id""".stripMargin,

    "bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT rk, doc_id, score FROM bmr WHERE rk <= 10""".stripMargin,

    "hybrid_rrf" ->
      s"""WITH ${rankedCtes("", "vec_id = 0", "cos")},
         |$bm25Ctes,
         |v AS (SELECT neighbor_id AS id, rk FROM r WHERE rk <= 20),
         |bm AS (SELECT doc_id AS id, rk FROM bmr WHERE rk <= 20),
         |u AS (SELECT id, 1.0 / (CAST(60 AS DOUBLE) + CAST(rk AS DOUBLE)) AS contrib
         |      FROM (SELECT id, rk FROM v UNION ALL SELECT id, rk FROM bm)),
         |fz AS (SELECT id, sum(contrib) AS rrf FROM u GROUP BY 1),
         |fr AS (SELECT id, rrf, row_number() OVER (ORDER BY rrf DESC, id) AS rk FROM fz)
         |SELECT rk, id, round(rrf, 6) AS rrf_score FROM fr WHERE rk <= 10""".stripMargin,

    "eval_recall" ->
      s"""WITH ${rankedCtes("", "vec_id BETWEEN 0 AND 49", "cos")},
         |$goldCte,
         |gr AS (SELECT g.q_id, r.rk AS rnk
         |       FROM g LEFT JOIN r
         |         ON r.q_id = g.q_id AND r.neighbor_id = g.expected_id AND r.rk <= 5)
         |SELECT CAST(5 AS BIGINT) AS k, count(*) AS total,
         |  round(CAST(sum(CASE WHEN rnk IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall_at_k,
         |  round(sum(CASE WHEN rnk IS NOT NULL THEN 1.0 / CAST(rnk AS DOUBLE) ELSE 0.0 END) / CAST(count(*) AS DOUBLE), 6) AS mrr,
         |  round(sum(CASE WHEN rnk IS NOT NULL THEN 1.0 / log2(CAST(rnk AS DOUBLE) + 1.0) ELSE 0.0 END) / CAST(count(*) AS DOUBLE), 6) AS ndcg
         |FROM gr""".stripMargin,

    "eval_compare" ->
      s"""WITH ${rankedCtes("l", "vec_id BETWEEN 0 AND 49", "cos")},
         |${rankedCtes("rt", "vec_id BETWEEN 0 AND 49", "dot")},
         |$goldCte,
         |lg AS (SELECT g.q_id, lr.rk AS lrnk
         |       FROM g LEFT JOIN lr
         |         ON lr.q_id = g.q_id AND lr.neighbor_id = g.expected_id AND lr.rk <= 5),
         |rg AS (SELECT g.q_id, rtr.rk AS rrnk
         |       FROM g LEFT JOIN rtr
         |         ON rtr.q_id = g.q_id AND rtr.neighbor_id = g.expected_id AND rtr.rk <= 5),
         |j AS (SELECT lg.q_id, lrnk, rrnk,
         |        CASE WHEN lrnk IS NULL AND rrnk IS NULL THEN NULL
         |             WHEN lrnk IS NULL THEN -999
         |             WHEN rrnk IS NULL THEN 999
         |             ELSE rrnk - lrnk END AS delta
         |      FROM lg JOIN rg ON lg.q_id = rg.q_id)
         |SELECT CAST(5 AS BIGINT) AS k, count(*) AS total,
         |  CAST(sum(CASE WHEN lrnk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_found,
         |  CAST(sum(CASE WHEN rrnk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_found,
         |  CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS regressions_count,
         |  CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS improvements_count,
         |  CAST(sum(CASE WHEN delta IS NOT NULL AND delta <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS changed_count
         |FROM j""".stripMargin,

    "search_compare" ->
      s"""WITH ${rankedCtes("l", "vec_id = 0", "cos")},
         |${rankedCtes("rt", "vec_id = 0", "dot")},
         |lt AS (SELECT rk, neighbor_id AS left_id, score AS left_score FROM lr WHERE rk <= 10),
         |rtt AS (SELECT rk, neighbor_id AS right_id, score AS right_score FROM rtr WHERE rk <= 10),
         |ov AS (SELECT count(*) AS overlap FROM
         |         (SELECT left_id FROM lt INTERSECT SELECT right_id FROM rtt))
         |SELECT lt.rk, left_id, left_score, right_id, right_score, ov.overlap
         |FROM lt JOIN rtt ON lt.rk = rtt.rk CROSS JOIN ov""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  upper(substr(hex(encode(text)), 1, 8)) AS magic,
        |  CASE WHEN doc_id % 3 = 0 THEN 320 + (doc_id % 4) * 160 END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN (320 + (doc_id % 4) * 160) // 4 * 3 END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(16000 AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 <> 0
        |       THEN round(CAST(octet_length(encode(text)) AS DOUBLE) / 1000.0, 3) END AS duration_s
        |FROM documents""".stripMargin,

    "curation_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS score_de,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS score_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','los','de','es','y','un'], x))) AS score_es,
        |    len(list_filter(toks, x -> list_contains(['le','les','et','est','un','une','de'], x))) AS score_fr
        |  FROM t),
        |l AS (
        |  SELECT doc_id,
        |    CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'unknown'
        |         WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
        |         WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
        |         WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
        |         ELSE 'fr' END AS pred_lang
        |  FROM s),
        |h AS (
        |  SELECT doc_id, pred_lang,
        |    CAST(CASE pred_lang WHEN 'en' THEN 40 WHEN 'de' THEN 100 WHEN 'es' THEN 100
        |         WHEN 'fr' THEN 100 WHEN 'unknown' THEN 25 ELSE 0 END AS BIGINT) AS rate,
        |    list_reduce(list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |      c -> CAST(ord(substr(CAST(doc_id AS VARCHAR), CAST(c AS INT), 1)) AS BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket
        |  FROM l)
        |SELECT doc_id, pred_lang, rate, bucket, bucket < rate AS keep FROM h""".stripMargin,

    "curation_budget" ->
      """WITH qt AS (
        |  SELECT doc_id, text, length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |qf AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
        |    len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS punct,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS stops
        |  FROM qt),
        |q AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
        |        + 0.3 * (1.0 - least(1.0, CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0))
        |        + 0.3 * least(1.0, CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0), 6) AS quality
        |  FROM qf WHERE n_tokens > 0),
        |bands AS (SELECT quality, sum(n_tokens) AS band_tokens FROM q GROUP BY 1),
        |cum AS (SELECT quality, band_tokens,
        |          CAST(sum(band_tokens) OVER (ORDER BY quality DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |        FROM bands),
        |k AS (SELECT quality, cum_tokens,
        |        (cum_tokens - band_tokens) < 20000 AS band_keep FROM cum)
        |SELECT q.doc_id, q.quality, q.n_tokens, k.cum_tokens, k.band_keep AS keep
        |FROM q JOIN k ON q.quality = k.quality""".stripMargin,

    "multimodal_audiowindows" -> graft.operators.Multimodal.audiowindowsOracleSql,

    "multimodal_phash" -> graft.operators.Multimodal.phashOracleSql,

    "multimodal_phash_pairs" -> graft.operators.Multimodal.phashPairsOracleSql,
    "multimodal_phash_clusters" -> graft.operators.Multimodal.phashClustersOracleSql,

    "curation_decontam" -> graft.operators.Curation.decontamOracleSql,

    "curation_mix" -> graft.operators.Curation.mixOracleSql,

    "curation_pack" -> graft.operators.Curation.packOracleSql,

    "curation_pack_global" -> graft.operators.Curation.packGlobalOracleSql,

    "curation_split" -> graft.operators.Curation.splitOracleSql,

    "multimodal_resize" ->
      """WITH m AS (SELECT doc_id, CAST(320 + (doc_id % 4) * 160 AS BIGINT) AS width
        |           FROM documents WHERE doc_id % 3 = 0),
        |r AS (SELECT doc_id, width, width // 4 * 3 AS height,
        |        round(least(1.0, 256.0 / CAST(greatest(width, width // 4 * 3) AS DOUBLE)), 6) AS scale
        |      FROM m)
        |SELECT doc_id, width, height, scale,
        |  CAST(floor(width * scale) AS BIGINT) AS out_width,
        |  CAST(floor(height * scale) AS BIGINT) AS out_height,
        |  CAST(floor(width * scale) AS BIGINT) * CAST(floor(height * scale) AS BIGINT) * 3 AS out_bytes
        |FROM r""".stripMargin,

    "multimodal_framesample" ->
      """WITH v AS (SELECT doc_id,
        |             round(CAST(octet_length(encode(text)) AS DOUBLE) / 1000.0, 3) AS dur
        |           -- video is the ELSE media class (not 0=image, not
        |           -- 1=audio): `= 2` would miss NEGATIVE ids, whose
        |           -- sign-preserving remainder is -1/-2 on both engines
        |           FROM documents WHERE doc_id % 3 NOT IN (0, 1)),
        |f AS (SELECT doc_id, CAST(floor(dur * 25) AS BIGINT) AS n_frames FROM v WHERE floor(dur * 25) > 0),
        |g AS (SELECT doc_id, n_frames,
        |        greatest(1, CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS BIGINT)) AS step
        |      FROM f),
        |e AS (SELECT doc_id, n_frames, step, t.k AS k
        |      FROM g, UNNEST(range(0, ((n_frames - 1) // step) + 1)) AS t(k))
        |SELECT doc_id, n_frames, k + 1 AS sample_idx, k * step AS frame_idx,
        |  round(CAST(k * step AS DOUBLE) / 25.0, 6) AS t_offset_s
        |FROM e""".stripMargin,

    "chunk_preview" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id BETWEEN 0 AND 4),
        |e AS (SELECT doc_id, text, t.j AS j
        |      FROM d, UNNEST(range(CASE WHEN n <= 50 THEN 1 ELSE 1 + (n - 11) // 40 END)) AS t(j))
        |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR) AS chunk_id,
        |  doc_id, j,
        |  substr(text, CAST(j * 40 + 1 AS INT), 50) AS chunk,
        |  length(substr(text, CAST(j * 40 + 1 AS INT), 50)) AS chunk_len
        |FROM e""".stripMargin,

    "search_preview" -> graft.operators.Search.searchPreviewOracleSql(bm25Ctes),

    "search_highlights" -> graft.operators.Search.searchHighlightsOracleSql(bm25Ctes),

    "pipeline_filter" ->
      s"""WITH RECURSIVE $pipelineFilterCtes
         |SELECT doc_id, quality, pred_lang, dup_keep, keep FROM pf""".stripMargin,

    "curation_weight" ->
      s"""WITH RECURSIVE ${graft.operators.Dedup.clusterMapCtes},
         |j AS (SELECT d.doc_id,
         |        COALESCE(cl.cluster_rep, d.doc_id) AS cluster_rep,
         |        CAST(COALESCE(cs.cluster_size, 1) AS BIGINT) AS cluster_size
         |      FROM documents d
         |      LEFT JOIN cl ON d.doc_id = cl.doc_id
         |      LEFT JOIN cs ON cl.cluster_rep = cs.cluster_rep)
         |SELECT doc_id, cluster_rep, cluster_size,
         |  round(1.0 / cluster_size, 6) AS weight
         |FROM j""".stripMargin,

    "curation_report" ->
      s"""WITH RECURSIVE $pipelineFilterCtes
         |SELECT count(*) AS n_docs,
         |  CAST(sum(CASE WHEN quality < 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_fail,
         |  CAST(sum(CASE WHEN pred_lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_fail,
         |  CAST(sum(CASE WHEN NOT dup_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_drop,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
         |FROM pf""".stripMargin,
    )
  }

  /** The curation-funnel CTE chain (`… pf(doc_id, quality, pred_lang,
    * dup_keep, keep)`): near-dup pairs from the two-stage LSH-verified
    * pipeline (the scale path pipelineFilter actually runs) →
    * recursive-CTE connected components → quality + language scoring →
    * composite keep decision. Shared by the pipeline_filter and
    * curation_report oracles.
    */
  private def pipelineFilterCtes: String =
      s"""${graft.operators.Dedup.verifiedClusterMapCtes},
         |qt AS (
         |  SELECT doc_id, text, length(text) AS n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks
         |  FROM documents),
         |qf AS (
         |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
         |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS s_en,
         |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS s_de,
         |    len(list_filter(toks, x -> list_contains(['el','la','los','de','es','y','un'], x))) AS s_es,
         |    len(list_filter(toks, x -> list_contains(['le','les','et','est','un','une','de'], x))) AS s_fr
         |  FROM qt),
         |scored AS (
         |  SELECT doc_id, n_tokens,
         |    round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
         |        + 0.3 * (1.0 - least(1.0, CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0))
         |        + 0.3 * least(1.0, CAST(s_en AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0), 6) AS quality,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
         |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
         |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
         |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
         |         ELSE 'fr' END AS pred_lang
         |  FROM qf)
         |,pf AS (
         |  SELECT s.doc_id, s.quality, s.pred_lang,
         |    COALESCE(clus.dup_keep, TRUE) AS dup_keep,
         |    (s.quality >= 0.75 AND s.pred_lang = 'en' AND COALESCE(clus.dup_keep, TRUE)) AS keep
         |  FROM scored s LEFT JOIN clus ON s.doc_id = clus.doc_id
         |  WHERE s.n_tokens > 0)""".stripMargin
}
