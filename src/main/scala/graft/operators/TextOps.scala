package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over the `documents` table: row→text assembly
  * (reference `app/ingest/chunker.py:5-12` concat_row, `normalize.py:3-7`),
  * plus the LLM-data-pipeline text extensions (token counting, language ID,
  * quality scoring, rolling-hash fingerprinting).
  *
  * Every operator here is a narrow map over the scan — zero shuffle, fully
  * inside WholeStageCodegen (no Scala UDFs) — so at 100 TB they scale with
  * input splits and the parquet reader only materializes the referenced
  * columns (check ReadSchema in explain).
  */
object TextOps {

  /** Lowercased whitespace tokens, python `text.lower().split()` semantics:
    * empty input → empty array, runs of whitespace collapse.
    */
  private def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  /** SURVEY §2 `doc_normalize`: normalize + concat_row. The reference joins
    * the scalar cells with " | " (chunker.py:5-7) after dropping all-null
    * rows (normalize.py:3-7), skipping cells that are empty after trim —
    * so NULL *and* ''/whitespace-only cells vanish from the joined text.
    * concat_ws skips only NULLs; nulling-out blank cells first matches.
    */
  def docNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).na.drop("all")
    def cell(c: Column): Column =
      when(length(trim(c)) === 0, lit(null: String)).otherwise(c)
    d.select(
        col("doc_id"),
        concat_ws(" | ",
          cell(col("doc_id").cast("string")), cell(col("text")),
          cell(col("lang")), cell(col("source")),
          cell(col("n_chars").cast("string"))).as("row_text"))
      .filter(length(trim(col("row_text"))) > 0)
  }

  /** SURVEY §2 `text_tokens`: whitespace token count + BPE-ish regex token
    * count (letters runs | digit runs | single non-alnum) + char count.
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long")
        .as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars"))

  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "los", "de", "es", "y", "un"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "de"))

  /** SURVEY §2 `text_langid`: stopword-profile scores per language; winner =
    * highest hit count, alphabetical tiebreak, `unknown` when all zero.
    * A real system swaps the profiles for char-n-gram models; the Spark
    * shape (narrow scored map + argmax CASE) is identical.
    *
    * All four profile scores come from ONE ProfileHits kernel pass
    * (entering via a Generate so projection collapse can't inline the
    * call per score column — the TextStats pattern).
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    withLangid(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(
        (col("doc_id") +: Profiles.map(p => col(s"score_${p._1}"))) :+
          col("pred_lang"): _*)

  /** The langid scoring as a reusable transform over ANY frame with a
    * `text` column — the [[withQuality]] counterpart: adds the four
    * profile scores and `pred_lang`, other columns pass through (same
    * single ProfileHits kernel pass entering via a Generate).
    */
  def withLangid(df: DataFrame): DataFrame = {
    val ph = graft.functions.ProfileHits.column(col("text"), Profiles.map(_._2))
    val passthrough = df.columns.map(col).toSeq
    val scored = df.select(passthrough :+ explode(array(ph)).as("ph"): _*)
      .select(passthrough ++
        Profiles.zipWithIndex.map { case ((l, _), i) =>
          col("ph").getItem(i).as(s"score_$l") }: _*)
    val best = greatest(Profiles.map(p => col(s"score_${p._1}")): _*)
    val pred = Profiles.foldRight(lit("unknown")) { case ((l, _), acc) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored.select((passthrough ++ Profiles.map(p => col(s"score_${p._1}"))) :+
      when(best === 0, lit("unknown")).otherwise(pred).as("pred_lang"): _*)
  }

  /** SURVEY §2 `text_langid_confusion`: the classifier-eval confusion
    * matrix — labeled language (the `lang` column) × predicted language
    * counts with per-label shares. This is how a pipeline decides whether
    * its langid stage is good enough to gate data on: the diagonal is the
    * per-language recall. One doc_id join + one tiny (lang, pred) agg;
    * the share window partitions over ≤|langs|² rows.
    */
  def textLangidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = textLangid(spark, dir).select(col("doc_id"), col("pred_lang"))
    val lab = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    lab.join(pred, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))).cast("double"), 6))
  }

  /** SURVEY §2 `text_quality`: length/punct/stopword/word-length features +
    * a bounded weighted score, arithmetic written identically to the DuckDB
    * oracle (int/int divisions are IEEE-exact; final score rounded 6dp).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    // One fused kernel pass produces [n_tok, punct, stops, sum_wlen].
    // It enters the plan through explode(array(..)) — a Generate node —
    // because projection collapse would otherwise inline the kernel call
    // into every one of its six downstream references (memory: the 16-sig
    // minhash pipeline recomputed 32×); a Generator output is materialized
    // once per row. Ratio/score arithmetic is unchanged (IEEE-identical
    // to the oracle).
    val st = graft.functions.TextStats.column(col("text"), Profiles.toMap.apply("en"))
    val nTok = col("st").getItem(0)
    val nChars = length(col("text")).cast("long")
    val punct = col("st").getItem(1)
    val stops = col("st").getItem(2)
    val sumWl = col("st").getItem(3)
    val punctRatio = punct.cast("double") / nChars.cast("double")
    val stopRatio = stops.cast("double") / nTok.cast("double")
    val avgWlen = sumWl.cast("double") / nTok.cast("double")
    val score =
      lit(0.4) * least(lit(1.0), nTok.cast("double") / 50.0) +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * 10.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * 5.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), explode(array(st)).as("st"))
      .filter(nTok > 0)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(punctRatio, 6).as("punct_ratio"),
        round(stopRatio, 6).as("stop_ratio"),
        round(avgWlen, 6).as("avg_word_len"),
        round(score, 6).as("quality"))
  }

  /** The text_quality scoring as a reusable transform over ANY frame with
    * a `text` column — batch or STREAMING (the kernel is an ordinary
    * expression; the map is stateless, so it runs unchanged under
    * Structured Streaming in append mode). Adds `n_tokens` and `quality`;
    * rows with zero tokens are dropped, other columns pass through.
    */
  def withQuality(df: DataFrame): DataFrame = {
    val st = graft.functions.TextStats.column(col("text"), Profiles.toMap.apply("en"))
    val nTok = col("st").getItem(0)
    val nChars = length(col("text")).cast("long")
    val punctRatio = col("st").getItem(1).cast("double") / nChars.cast("double")
    val stopRatio = col("st").getItem(2).cast("double") / nTok.cast("double")
    val score =
      lit(0.4) * least(lit(1.0), nTok.cast("double") / 50.0) +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * 10.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * 5.0)
    val passthrough = df.columns.map(col).toSeq
    df.select(passthrough :+ explode(array(st)).as("st"): _*)
      .filter(nTok > 0)
      .select(passthrough :+ nTok.as("n_tokens") :+ round(score, 6).as("quality"): _*)
  }

  /** SURVEY §2 `text_repetition`: duplicate word-3-gram ratio — the
    * Gopher-style repetition filter for LLM training data (a doc whose
    * n-grams are mostly repeats is boilerplate/spam). total 3-grams is
    * n_tokens−2; distinct comes from the WordShingles kernel; ratio
    * = 1 − distinct/total. Narrow map, one kernel pass per doc.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.operators.Dedup.wsTokens(col("text"))
    val total = greatest(lit(0), size(toks) - 2).cast("long")
    val distinctN = size(Dedup.shingles(col("text"))).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), total.as("n_ngrams"), distinctN.as("n_distinct"))
      .filter(col("n_ngrams") > 0)
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams").cast("double"), 6))
  }

  /** SURVEY §2 `text_entropy`: character-distribution Shannon entropy
    * (bits/char) + distinct-char count — low entropy flags repeated
    * boilerplate, high entropy flags binary junk. One kernel pass
    * ([[graft.functions.TextEntropy]]), no shuffle; the oracle replays
    * the identical count-based formula over an exploded char table.
    */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val te = graft.functions.TextEntropy.column(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array(te)).as("te"))
      .filter(size(col("te")) > 0)
      .select(col("doc_id"),
        col("te").getItem(0).cast("long").as("n_distinct_chars"),
        round(col("te").getItem(1), 6).as("entropy_bits"))
  }

  // Redaction patterns: the RE2/Java-common subset (no lookaround, no
  // backrefs) so Spark and DuckDB match identically.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** SURVEY §2 `text_redact`: PII-style scrubbing — count and replace
    * email addresses and URLs with placeholder tokens (the standard
    * pre-training redaction pass). Pure narrow map; patterns restricted
    * to the regex subset both engines implement identically.
    */
  def textRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(UrlRe)).cast("long").as("n_urls"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>").as("redacted"))

  val FpMod = 1000000007L
  val FpBase = 31L

  /** Polynomial rolling hash of a string column: fold of
    * `acc = (acc*31 + codepoint) mod 1e9+7` — the classic Rabin-Karp
    * fingerprint the reference family uses for doc identity. Backed by the
    * native codegen'd [[graft.functions.PolyHash]] expression: one O(len)
    * loop inside WholeStageCodegen.
    */
  def fingerprint(c: Column): Column =
    graft.functions.PolyHash.column(c, FpBase, FpMod)

  /** Four independent (base, prime-modulus) lanes for the wide fingerprint:
    * ~120-bit combined keyspace, collision-free at 100 TB corpus scale
    * (birthday bound ~2^60 chunks), while every lane stays replicable in
    * plain SQL integer arithmetic (products < 2^62, no overflow on either
    * engine).
    */
  val FpLanes: Seq[(Long, Long)] = Seq(
    (31L, 1000000007L), (131L, 998244353L),
    (257L, 2147483629L), (1009L, 2130706433L))

  /** 128-bit-class fingerprint of a string column: a struct of four
    * independent [[graft.functions.PolyHash]] lanes (distinct base/modulus
    * pairs). Grouping on the struct keys the shuffle on 4 longs — still a
    * scalar-width key, but with a keyspace where birthday collisions are
    * impossible at any realistic corpus size. This is the production form
    * of [[fingerprint]] (whose single 30-bit lane collides at ~50k chunks).
    */
  def fingerprintWide(c: Column): Column =
    struct(FpLanes.zipWithIndex.map { case ((b, m), i) =>
      graft.functions.PolyHash.column(c, b, m).as(s"fp$i")
    }: _*)

  /** `text_vocab`: corpus vocabulary with collection frequency and
    * document frequency, top-100 by (tf, term) — the input table for
    * tokenizer/vocab construction in a training-data pipeline. One
    * (doc,term) shuffle with map-side combine, then a tiny ranked head.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    // TermCounts pre-aggregates per doc, so exploding yields one row per
    // distinct (doc, term) — no corpus-sized shuffle before the term agg.
    // The per-doc maps come from the shared materialized stats
    // (Search.perDocTerms), so vocab/BM25/hybrid build them once.
    val perDoc = Search.perDocTerms(spark, dir)
      .select(col("doc_id"), explode(col("tc")).as(Seq("term", "f")))
    val vocab = perDoc.groupBy(col("term"))
      .agg(sum(col("f")).as("tf"), count(lit(1)).as("df"))
    graft.functions.Ranking.topK(vocab, 100, col("tf").desc, col("term"))
      .select(col("rk"), col("term"), col("tf"), col("df"))
  }

  /** SURVEY §2 `text_surprisal`: unigram-LM surprisal per document — the
    * language-model quality signal of CCNet/Gopher-style filters (docs
    * whose tokens are improbable under the corpus LM are outliers), with
    * the corpus itself as the unigram model: `p(w) = (cf_w + 1)/(T + V)`
    * (add-one smoothing), score = mean `-log2 p(w)` over doc tokens.
    *
    * Scale shape: per-doc term counts come from the shared materialized
    * [[Search.perDocTerms]] maps (no corpus-sized (doc, token) shuffle),
    * the unigram table is one vocabulary-sized agg, `T+V` is a one-row
    * aggregate inlined via crossJoin(broadcast(…)) (the chunk_histogram
    * pattern — one job, no driver round-trip), and the per-doc
    * mean folds over the TERM-SORTED contribution list — collect_list +
    * array_sort + sequential fold, the identical op order as the oracle's
    * `list(bits ORDER BY term)` + `list_sum`, so double summation can
    * never diverge across engines.
    */
  def textSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val pd = Search.perDocTerms(spark, dir)
      .select(col("doc_id"), col("dl"), explode(col("tc")).as(Seq("term", "f")))
    val vocab = pd.groupBy(col("term")).agg(sum(col("f")).as("cf"))
    val tv = pd.agg(
      (sum(col("f")) + countDistinct(col("term"))).as("tv"))
    val bits = col("f").cast("double") *
      -log2((col("cf") + 1).cast("double") / col("tv").cast("double"))
    pd.join(vocab, Seq("term"))
      .crossJoin(broadcast(tv))
      .select(col("doc_id"), col("dl"), struct(col("term"), bits.as("bits")).as("tb"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(array_sort(collect_list(col("tb"))).as("tbs"))
      .select(col("doc_id"), col("dl").as("n_tokens"),
        round(
          aggregate(col("tbs"), lit(0.0), (a, x) => a + x("bits")) / col("dl").cast("double"),
          6).as("surprisal_bits"))
  }

  /** DuckDB oracle for text_surprisal: same unigram model and the same
    * term-ordered summation.
    */
  def surprisalOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(lower(trim(text)), '\s+') END) AS term
      |  FROM documents),
      |pd AS (SELECT doc_id, term, count(*) AS f FROM toks GROUP BY 1, 2),
      |dls AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS dl FROM pd GROUP BY 1),
      |v AS (SELECT term, CAST(sum(f) AS BIGINT) AS cf FROM pd GROUP BY 1),
      |g AS (SELECT CAST(sum(cf) AS BIGINT) + CAST(count(*) AS BIGINT) AS tv FROM v),
      |tb AS (SELECT pd.doc_id, pd.term,
      |        CAST(pd.f AS DOUBLE) * -log2(CAST(v.cf + 1 AS DOUBLE) / CAST(g.tv AS DOUBLE)) AS bits
      |      FROM pd JOIN v ON pd.term = v.term CROSS JOIN g),
      |s AS (SELECT doc_id, list(bits ORDER BY term) AS bl FROM tb GROUP BY 1)
      |SELECT s.doc_id, dls.dl AS n_tokens,
      |  round(list_sum(bl) / CAST(dls.dl AS DOUBLE), 6) AS surprisal_bits
      |FROM s JOIN dls ON s.doc_id = dls.doc_id""".stripMargin

  /** SURVEY §2 `text_tfidf`: per-document top-3 TF-IDF keywords — the
    * standard keyword-extraction / doc-labeling pass of a training-data
    * pipeline (cluster naming, topic tagging, search boosting).
    *
    * Scale shape: per-doc term counts come from the shared materialized
    * [[Search.perDocTerms]] maps (one distinct-(doc,term) row per map
    * entry, never a corpus-sized token shuffle); `df` is one
    * vocabulary-sized agg; the score join is term-keyed (AQE broadcasts
    * the vocab side when small); the per-doc rank window partitions by
    * doc_id, so no global sort. Ties at tfidf=0 (df = n_docs ⇒ ln 1) break
    * on term asc — deterministic on both engines.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val pd = Search.perDocTerms(spark, dir)
      .select(col("doc_id"), explode(col("tc")).as(Seq("term", "f")))
    // Bounded driver scalar (the vec_quantize collect pattern): the doc
    // count feeds idf as a literal on both engines.
    val nDocs = Search.perDocTerms(spark, dir).count()
    val dfT = pd.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = pd.join(dfT, Seq("term"))
      .withColumn("tfidf", round(
        col("f").cast("double") *
          log(lit(nDocs).cast("double") / col("df").cast("double")), 6))
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        col("f").cast("long").as("tf"), col("df"), col("tfidf"))
  }

  /** DuckDB oracle for text_tfidf: same tokens, same idf, same rank. */
  def tfidfOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(lower(trim(text)), '\s+') END) AS term
      |  FROM documents),
      |pd AS (SELECT doc_id, term, count(*) AS f FROM toks GROUP BY 1, 2),
      |st AS (SELECT count(DISTINCT doc_id) AS n_docs FROM pd),
      |dft AS (SELECT term, count(*) AS df FROM pd GROUP BY 1),
      |sc AS (SELECT pd.doc_id, pd.term, pd.f, dft.df,
      |        round(CAST(pd.f AS DOUBLE) *
      |          ln(CAST(st.n_docs AS DOUBLE) / CAST(dft.df AS DOUBLE)), 6) AS tfidf
      |      FROM pd JOIN dft ON pd.term = dft.term CROSS JOIN st),
      |r AS (SELECT doc_id, term, f, df, tfidf,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |      FROM sc)
      |SELECT doc_id, rk, term, CAST(f AS BIGINT) AS tf, df, tfidf
      |FROM r WHERE rk <= 3""".stripMargin

  /** SURVEY §2 `corpus_stats`: per-source corpus composition — doc count,
    * token count, distinct-term count, mean doc length, and type-token
    * ratio. This is the first table anyone prints about a 100 TB corpus
    * (what's in it, how big, how repetitive per slice); TTR collapse in a
    * source flags boilerplate floods before any dedup runs.
    *
    * Scale shape: ONE [[graft.functions.TermCounts]] kernel pass feeds a
    * (source, term) agg with map-side combine (the exploded rows are
    * per-doc DISTINCT terms, so the shuffle is bounded by Σ|vocab per
    * doc|, not token count); the doc count is a separate kernel-free
    * narrow scan; everything downstream is source-cardinality-sized.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.documents(spark, dir)
      .select(col("source"), explode(graft.functions.TermCounts.column(col("text")))
        .as(Seq("term", "f")))
      .groupBy(col("source"), col("term")).agg(sum(col("f")).as("cf"))
    val tok = pt.groupBy(col("source")).agg(
      count(lit(1)).as("n_distinct_terms"), sum(col("cf")).as("n_tokens"))
    val nd = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    nd.join(tok, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct_terms"), lit(0L)).as("n_distinct_terms"),
        round(coalesce(col("n_tokens"), lit(0L)).cast("double") /
          col("n_docs").cast("double"), 6).as("avg_doc_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_distinct_terms").cast("double") /
            col("n_tokens").cast("double"), 6)).as("ttr"))
  }

  /** DuckDB oracle for corpus_stats — same tokens, same per-source sums. */
  def corpusStatsOracleSql: String =
    """WITH toks AS (
      |  SELECT source, UNNEST(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(lower(trim(text)), '\s+') END) AS term
      |  FROM documents),
      |pt AS (SELECT source, term, count(*) AS cf FROM toks GROUP BY 1, 2),
      |tok AS (SELECT source, count(*) AS n_distinct_terms,
      |          CAST(sum(cf) AS BIGINT) AS n_tokens
      |        FROM pt GROUP BY 1),
      |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT nd.source, nd.n_docs,
      |  COALESCE(tok.n_tokens, 0) AS n_tokens,
      |  COALESCE(tok.n_distinct_terms, 0) AS n_distinct_terms,
      |  round(CAST(COALESCE(tok.n_tokens, 0) AS DOUBLE) / CAST(nd.n_docs AS DOUBLE), 6) AS avg_doc_tokens,
      |  CASE WHEN COALESCE(tok.n_tokens, 0) = 0 THEN 0.0
      |       ELSE round(CAST(tok.n_distinct_terms AS DOUBLE) / CAST(tok.n_tokens AS DOUBLE), 6)
      |  END AS ttr
      |FROM nd LEFT JOIN tok ON nd.source = tok.source""".stripMargin

  /** SURVEY §2 `text_bpe_pairs`: the first BPE merge iteration's count
    * table — corpus-wide within-token adjacent character-pair frequencies,
    * top-50 by (count, pair). This is tokenizer training's inner
    * statistic (pick the most frequent pair, merge, repeat); the full loop
    * is sequential by nature, but each iteration IS this query, so the
    * distributed primitive is what matters at 100 TB. One narrow
    * [[graft.functions.PairCounts]] kernel pass per doc (pre-aggregated
    * maps — the TermCounts shape), then a pair-vocabulary-sized agg and a
    * TakeOrdered head.
    */
  def textBpePairs(spark: SparkSession, dir: String): DataFrame = {
    val pd = Tables.documents(spark, dir)
      .select(explode(graft.functions.PairCounts.column(col("text"))).as(Seq("pair", "f")))
    val agg = pd.groupBy(col("pair")).agg(sum(col("f")).as("n"))
    graft.functions.Ranking.topK(agg, 50, col("n").desc, col("pair"))
      .select(col("rk"), col("pair"), col("n"))
  }

  /** DuckDB oracle for text_bpe_pairs — same tokens, `substr` pairs. */
  def bpePairsOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
      |  FROM documents),
      |tok AS (SELECT unnest(toks) AS tok FROM t),
      |pr AS (SELECT substr(tok, CAST(u.i AS INT), 2) AS pair
      |       FROM tok, UNNEST(range(1, length(tok))) AS u(i)),
      |v AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1),
      |r AS (SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk FROM v)
      |SELECT rk, pair, n FROM r WHERE rk <= 50""".stripMargin

  /** How many BPE merges [[textBpeTrain]] learns, and the count floor
    * below which training stops (merging a once-seen pair carries no
    * signal). Shared with the generated oracle SQL.
    */
  val BpeTrainMerges = 50
  val BpeTrainMinCount = 2L

  /** SURVEY §2 `text_bpe_train`: the FULL BPE trainer — the ordered merge
    * list (Sennrich et al. 2016), the artifact a tokenizer-training
    * pipeline actually ships. [[textBpePairs]] is iteration 1's count
    * table; this runs the loop: count adjacent symbol pairs over the
    * word vocabulary, merge the most frequent pair everywhere (ties by
    * lexicographic pair — deterministic on both engines), repeat
    * [[BpeTrainMerges]] times or until no pair clears
    * [[BpeTrainMinCount]].
    *
    * Scale shape: the ONE corpus-sized stage is the initial word count —
    * everything after runs over the DISTINCT-WORD vocabulary with
    * frequencies (the standard trainer trick; vocabulary grows ~log with
    * corpus size, so 100 TB of text still trains over a few-million-row
    * frame). Each round is a narrow pair-explode + pair-vocab aggregation
    * + TakeOrdered(1); the argmax pair is the round's only driver-side
    * scalar (bounded by construction — one row), the broadcast-literal
    * pattern. Merge application is a codegen'd `aggregate` fold per word;
    * the state frame is checkpointed per round exactly like
    * [[Dedup.dedupClusters]]' propagation loop, keeping lineage flat
    * across 50 rounds.
    */
  def textBpeTrain(spark: SparkSession, dir: String): DataFrame =
    textBpeTrainDf(spark, Tables.documents(spark, dir), BpeTrainMerges)

  /** [[textBpeTrain]] over ANY (doc_id, text) frame — the library form. */
  def textBpeTrainDf(spark: SparkSession, docs: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    val words = docs
      .select(explode(wsTokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // Size the training loop's partitioning to the VOCABULARY, not the
    // corpus: 50 sequential rounds over a few-thousand-row frame spread
    // across 32 shuffle partitions is pure task-scheduling latency
    // (~150 ms/round measured at sf0.1). One partition per ~1M distinct
    // words keeps each round a handful of tasks at any scale. The count
    // is a bounded scalar (one row) — the broadcast-literal pattern.
    val nWords = words.count()
    val parts = math.max(1L, nWords / 1000000L).toInt
    var st = words
      // per-character initial segmentation via positional substring (the
      // oracle's substr shape; split(word, "") would keep a trailing "")
      .select(col("cnt"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
          .as("syms"))
      .coalesce(parts)
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var it = 0
    var done = false
    while (it < merges && !done) {
      // size<2 guard BEFORE sequence(): sequence(0, -1) would descend
      val best = st.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), (i + 1).cast("int")).as("a"),
            element_at(col("syms"), (i + 2).cast("int")).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= BpeTrainMinCount)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect() // bounded: the round's single argmax pair
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val m = a + b
        out += ((it + 1L, a, b, m, c))
        // leftmost non-overlapping replace of [a,b] with the merged
        // symbol, as a fold: a merge consumes its right symbol, so the
        // just-merged token can't re-match as the pair's left side.
        // The round's pair rides in as broadcast DATA, not literals —
        // embedding it as literals changed the generated code every
        // round and made the loop recompile 50 codegen classes (the
        // dominant cost at small SF; with the constant plan shape every
        // round after the first hits the codegen cache).
        val bestDf = Seq((a, b, m)).toDF("ba", "bb", "bm")
        st = st.crossJoin(broadcast(bestDf))
          .select(col("cnt"),
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, x) => when(size(acc) > 0 &&
                  element_at(acc, -1) === col("ba") && x === col("bb"),
                concat(slice(acc, lit(1), size(acc) - 1), array(col("bm"))))
                .otherwise(concat(acc, array(x)))).as("syms"))
          .localCheckpoint(true)
        it += 1
      }
    }
    // The merge list IS the trained model — N driver-held rows by
    // construction (the IVF-centroid convention: fits are small).
    out.toSeq.toDF("merge_rank", "sym_a", "sym_b", "merged", "n_occurrences")
  }

  /** DuckDB oracle for [[textBpeTrain]]: the identical trainer as one
    * recursive CTE — the working table holds the vocabulary's current
    * segmentation, the recursive term self-joins it against its own
    * argmax pair (DuckDB permits aggregating the working table) and
    * applies the merge with a `list_reduce` fold, and each round's merge
    * rides out on the state rows.
    */
  def bpeTrainOracleSql: String = {
    val n = BpeTrainMerges
    val mc = BpeTrainMinCount
    s"""WITH RECURSIVE v0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
       |    list_transform(range(1, length(word)+1),
       |      i -> substr(word, CAST(i AS INT), 1)) AS syms
       |  FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0
       |          THEN CAST([] AS VARCHAR[])
       |          ELSE string_split_regex(lower(trim(text)), '\\s+') END) AS word
       |        FROM documents)
       |  WHERE length(word) > 0
       |  GROUP BY word),
       |st AS (
       |  SELECT 0 AS it, cnt, syms, CAST(NULL AS VARCHAR) AS ma,
       |    CAST(NULL AS VARCHAR) AS mb, CAST(NULL AS BIGINT) AS mc
       |  FROM v0
       |  UNION ALL
       |  SELECT st.it + 1, st.cnt,
       |    list_reduce(list_transform(st.syms, s -> [s]),
       |      (acc, x) -> CASE WHEN acc[-1] = best.a AND x[1] = best.b
       |        THEN list_append(list_slice(acc, 1, len(acc)-1), best.a || best.b)
       |        ELSE list_append(acc, x[1]) END),
       |    best.a, best.b, best.c
       |  FROM st, (
       |    SELECT a, b, c FROM (
       |      SELECT u.pr['a'] AS a, u.pr['b'] AS b, CAST(sum(s2.cnt) AS BIGINT) AS c
       |      FROM st s2, UNNEST(list_transform(range(1, len(s2.syms)),
       |        i -> struct_pack(a := s2.syms[CAST(i AS INT)],
       |          b := s2.syms[CAST(i AS INT)+1]))) AS u(pr)
       |      GROUP BY 1, 2) p
       |    WHERE c >= $mc
       |    ORDER BY c DESC, a, b LIMIT 1) best
       |  WHERE st.it < $n)
       |SELECT DISTINCT CAST(it AS BIGINT) AS merge_rank, ma AS sym_a,
       |  mb AS sym_b, ma || mb AS merged, mc AS n_occurrences
       |FROM st WHERE it >= 1 ORDER BY merge_rank""".stripMargin
  }

  /** SURVEY §2 `text_fingerprint`. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      fingerprint(lower(trim(col("text")))).as("fp_norm"))
}
