package graft

import graft.functions.PolyHash
import graft.operators.TextOps
import graft.sources.Tables

class TextOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("text_tokens matches python-split semantics") {
    val got = TextOps.textTokens(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("n_chars")))
      .toMap
    val bpe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    docs.foreach { case (id, text) =>
      val ws = text.trim.split("\\s+").count(_.nonEmpty)
      val nb = bpe.findAllIn(text).length
      assert(got(id) == ((ws.toLong, nb.toLong, text.length.toLong)), s"doc $id")
    }
  }

  test("text_fingerprint equals the PolyHash kernel on raw and normalized text") {
    val got = TextOps.textFingerprint(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("fp"), r.getAs[Long]("fp_norm")))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id)._1 == PolyHash.hash(text, 31, 1000000007L))
      assert(got(id)._2 == PolyHash.hash(text.trim.toLowerCase, 31, 1000000007L))
    }
  }

  test("text_langid picks the argmax profile with alphabetical tiebreak") {
    val rows = TextOps.textLangid(spark, dir).collect()
    rows.foreach { r =>
      val scores = Map(
        "de" -> r.getAs[Long]("score_de"), "en" -> r.getAs[Long]("score_en"),
        "es" -> r.getAs[Long]("score_es"), "fr" -> r.getAs[Long]("score_fr"))
      val pred = r.getAs[String]("pred_lang")
      if (scores.values.max == 0) assert(pred == "unknown")
      else {
        val best = scores.values.max
        val winner = scores.filter(_._2 == best).keys.min
        assert(pred == winner)
      }
    }
  }

  test("text_quality is bounded and ratios are consistent") {
    val rows = TextOps.textQuality(spark, dir).collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0 + 1e-9)
      assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
      assert(r.getAs[Double]("avg_word_len") > 0.0)
    }
  }

  test("doc_normalize joins all scalar cells with the reference separator") {
    val got = TextOps.docNormalize(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("row_text")).toMap
    val full = Tables.documents(spark, dir).collect()
    full.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = Seq(id.toString, r.getAs[String]("text"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars").toString).mkString(" | ")
      assert(got(id) == want)
    }
  }

  test("text_repetition equals a distinct/total shingle replica") {
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.textRepetition(spark, dir).collect()
    rows.foreach { r =>
      val toks = graft.functions.GraftText.wsTokens(texts(r.getAs[Long]("doc_id")))
      val total = math.max(0, toks.length - 2)
      val distinct = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet.size
      assert(r.getAs[Long]("n_ngrams") == total)
      assert(r.getAs[Long]("n_distinct") == distinct)
      val want = BigDecimal(1.0 - distinct.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rep_ratio") == want)
    }
    // every doc with >= 3 tokens appears
    val expected = texts.count { case (_, t) => graft.functions.GraftText.wsTokens(t).length >= 3 }
    assert(rows.length == expected)
  }


  test("text_redact scrubs emails and urls with matching counts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail me at a.b+c@test-host.example.org or visit https://x.io/path?q=1 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.zz and w@v.qq plus http://plain.example")).toDF("doc_id", "text")
    // run the same column program textRedact uses, against the tiny frame
    import org.apache.spark.sql.functions._
    val out = df.select(col("doc_id"),
      regexp_count(col("text"), lit(TextOps.EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(TextOps.UrlRe)).cast("long").as("n_urls"),
      regexp_replace(regexp_replace(col("text"), TextOps.EmailRe, "<EMAIL>"),
        TextOps.UrlRe, "<URL>").as("redacted"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((1L, 1L, "mail me at <EMAIL> or visit <URL> ok")))
    assert(out(2L) == ((0L, 0L, "no pii here at all")))
    assert(out(3L)._1 == 2L && out(3L)._2 == 1L)
    assert(!out(3L)._3.contains("@") && !out(3L)._3.contains("http"))
    // the registered query runs over real testdata without error
    val real = TextOps.textRedact(spark, dir).collect()
    assert(real.length == 500 || real.nonEmpty)
  }


  test("text_entropy matches a frequency-table replica") {
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.textEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_distinct_chars"), r.getAs[Double]("entropy_bits"))).toMap
    assert(got.size == texts.count(_._2.nonEmpty))
    texts.filter(_._2.nonEmpty).take(50).foreach { case (id, t) =>
      val freq = t.codePoints().toArray.groupBy(identity).view.mapValues(_.length).toMap
      val n = t.codePointCount(0, t.length).toDouble
      val ln2 = math.log(2.0)
      val h = math.log(n) / ln2 -
        freq.values.map(c => c * (math.log(c.toDouble) / ln2)).sum / n
      val (nd, ent) = got(id)
      assert(nd == freq.size, s"doc $id distinct")
      assert(math.abs(ent - h) < 1e-5, s"doc $id entropy")
      assert(ent >= 0.0 && ent <= math.log(n) / ln2 + 1e-9)
    }
  }


  test("text_surprisal matches a scala unigram-LM replica") {
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Array[String] = {
      val s = graft.functions.GraftText.wsTokens(t)
      s
    }
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.values.foreach(t => toks(t).foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1))
    val tPlusV = counts.values.sum + counts.size
    val ln2 = math.log(2.0)
    val got = TextOps.textSurprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("surprisal_bits"))).toMap
    val nonEmpty = texts.filter(t => toks(t._2).nonEmpty)
    assert(got.size == nonEmpty.size)
    nonEmpty.take(50).foreach { case (id, t) =>
      val ws = toks(t)
      val bits = ws.map { w =>
        val p = (counts(w) + 1).toDouble / tPlusV.toDouble
        -(math.log(p) / ln2)
      }.sum
      val (n, s) = got(id)
      assert(n == ws.length.toLong, s"doc $id n_tokens")
      assert(math.abs(s - bits / ws.length) < 1e-6, s"doc $id surprisal")
    }
    // corpus-common tokens are low-surprisal: every doc's score is positive
    // and bounded by log2(T+V) (the rarest possible token's bits)
    val cap = math.log(tPlusV.toDouble) / ln2
    got.values.foreach { case (_, s) => assert(s > 0.0 && s <= cap) }
  }

  test("text_bpe_pairs matches a scala pair-count replica") {
    val texts = Tables.documents(spark, dir).select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      graft.functions.GraftText.wsTokens(t).foreach { tok =>
        var i = 0
        while (i < tok.length - 1) {
          val p = tok.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
          i += 1
        }
      }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
      .zipWithIndex.map { case ((p, n), i) => (i + 1L, p, n) }
    val got = TextOps.textBpePairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("pair"), r.getAs[Long]("n")))
      .sortBy(_._1).toSeq
    assert(got == want)
  }
  test("text_bpe_train replays the hand-computed Sennrich toy corpus") {
    // Vocabulary: low:4 lower:1 lowest:1 new:2 newer:1 newest:1 wider:1
    // wide:1. Hand-derived merge order (max count, ties to the
    // lexicographically smallest pair):
    //  1 l+o (6: low 4, lower, lowest)   2 lo+w (6)
    //  3 e+w (4: new 2, newer, newest; ties (n,e)=4 → 'e'<'n')
    //  4 n+ew (4)
    //  5 e+r (3: lower, newer, wider)
    //  6 e+s (2; ties (s,t),(w,i),(i,d) all 2 → 'e' smallest;
    //    note wider lost (d,e) to merge 5: [w,i,d,er])
    //  7 es+t (2)  8 i+d (2: tie (w,i) → 'i'<'w')
    //  Cap at 8 merges to keep the hand computation airtight.
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low"),
      (3L, "wider wide new")).toDF("doc_id", "text")
    val got = TextOps.textBpeTrainDf(spark, docs, merges = 8).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[String]("merged"),
        r.getAs[Long]("n_occurrences"))).sortBy(_._1).toSeq
    val want = Seq(
      (1L, "l", "o", "lo", 6L), (2L, "lo", "w", "low", 6L),
      (3L, "e", "w", "ew", 4L), (4L, "n", "ew", "new", 4L),
      (5L, "e", "r", "er", 3L), (6L, "e", "s", "es", 2L),
      (7L, "es", "t", "est", 2L), (8L, "i", "d", "id", 2L))
    assert(got == want)
  }

  test("text_bpe_train stops when no pair clears the count floor") {
    val s = spark
    import s.implicits._
    // every word unique and 2 chars → every pair count 1 < floor
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(TextOps.textBpeTrainDf(spark, docs, merges = 10).isEmpty)
    // overlapping pair merges leftmost-first: aaaa → [aa, aa], (a,a)=6
    val rep = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = TextOps.textBpeTrainDf(spark, rep, merges = 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(4)) == ("a", "a", 6L))
  }

  test("text_tfidf matches a scala tf-idf replica (top-3 per doc)") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.functions.GraftText.wsTokens(r.getString(1)))
    val perDoc = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.filter(_._2.nonEmpty)
    val nDocs = perDoc.length.toLong
    val dfm = perDoc.flatMap(_._2.keys).groupBy(identity).view.mapValues(_.length.toLong)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = perDoc.flatMap { case (id, tc) =>
      tc.toSeq.map { case (t, f) =>
        (id, t, f, dfm(t), r6(f.toDouble * math.log(nDocs.toDouble / dfm(t).toDouble)))
      }.sortBy { case (_, t, _, _, s) => (-s, t) }.take(3)
        .zipWithIndex.map { case ((i, t, f, df, s), k) => (i, k + 1L, t, f, df, s) }
    }.toSet
    val got = TextOps.textTfidf(spark, dir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("rk"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf"))).toSet
    assert(got == want)
  }

  test("corpus_stats matches a scala per-source replica") {
    val docs = Tables.documents(spark, dir).select("source", "text").collect()
      .map(r => r.getString(0) -> graft.functions.GraftText.wsTokens(r.getString(1)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.groupBy(_._1).map { case (src, rs) =>
      val toks = rs.flatMap(_._2)
      val nTok = toks.length.toLong
      val nDis = toks.distinct.length.toLong
      (src, rs.length.toLong, nTok, nDis,
        r6(nTok.toDouble / rs.length),
        if (nTok == 0) 0.0 else r6(nDis.toDouble / nTok))
    }.toSet
    val got = TextOps.corpusStats(spark, dir).collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct_terms"), r.getAs[Double]("avg_doc_tokens"),
        r.getAs[Double]("ttr"))).toSet
    assert(got == want)
  }
  test("text_langid_confusion is consistent with textLangid and the labels") {
    val pred = TextOps.textLangid(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val lab = Tables.documents(spark, dir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cm = lab.toSeq.map { case (id, l) => (l, pred(id)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val perLang = cm.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val want = cm.map { case ((l, p), n) =>
      (l, p, n, r6(n.toDouble / perLang(l)))
    }.toSet
    val got = TextOps.textLangidConfusion(spark, dir).collect().map(r =>
      (r.getAs[String]("lang"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("share"))).toSet
    assert(got == want)
    // shares per labeled language sum to 1 within rounding
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.toSeq.map(_._4).sum - 1.0) < 1e-4)
    }
  }
}
