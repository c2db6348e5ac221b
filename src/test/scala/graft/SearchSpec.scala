package graft

import graft.operators.Search
import graft.sources.Tables

/** Independent in-JVM replicas of the BM25 / RRF / eval math, checked
  * against the distributed implementations on real data. The DuckDB oracle
  * covers Spark↔SQL parity; these cover Spark↔reference-algorithm parity
  * (BM25Okapi semantics from the reference's hybrid.py).
  */
class SearchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val corpus: Map[Long, Seq[String]] =
    Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .toMap

  /** rank_bm25.BM25Okapi replica: k1=1.5, b=0.75, epsilon=0.25. */
  private def bm25Reference(query: Seq[String]): Map[Long, Double] = {
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val df = corpus.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val idfRaw = df.map { case (t, d) => t -> math.log((n - d + 0.5) / (d + 0.5)) }
    val avgIdf = idfRaw.values.sum / idfRaw.size
    val idf = idfRaw.map { case (t, v) => t -> (if (v < 0) 0.25 * avgIdf else v) }
    corpus.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val terms = query.flatMap { t =>
        val f = toks.count(_ == t).toDouble
        if (f == 0 || !idf.contains(t)) None
        else Some(idf(t) * (f * 2.5) / (f + 1.5 * (0.25 + 0.75 * (dl / avgdl))))
      }
      // NB: with a tiny vocabulary every idf is negative (and so is the
      // BM25Okapi epsilon floor), so scores can legitimately be < 0 —
      // membership is "has >= 1 matching term", not "score > 0".
      if (terms.nonEmpty) Some(id -> terms.sum) else None
    }
  }

  test("bm25_topk matches the BM25Okapi replica") {
    val query = Search.QueryText.toLowerCase.split("\\s+").toSeq
    val want = bm25Reference(query)
      .map { case (id, s) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(Search.BmK)
    val got = Search.bm25TopK(spark, dir).collect()
      .sortBy(_.getAs[Long]("rk"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gid, gs), (wid, ws)) =>
      assert(gid == wid, s"doc order: got $gid want $wid")
      assert(math.abs(gs - ws) < 1e-6, s"score: got $gs want $ws")
    }
  }

  test("hybrid_rrf equals hand-fused knn + bm25 lists") {
    val e = graft.operators.VectorOps.embWithNorm(spark, dir)
    val vec = graft.operators.VectorOps
      .topK(e, e.filter(org.apache.spark.sql.functions.col("vec_id") === 0L), 20, "cos")
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rk")))
    val bm = Search.bm25Top(spark, dir, 20)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")))
    val fused = (vec ++ bm).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(x => 1.0 / (60.0 + x._2)).sum }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Search.hybridRrf(spark, dir).collect().sortBy(_.getAs[Long]("rk"))
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("rrf_score")))
    got.zip(fused).foreach { case ((gid, gs), (wid, ws)) =>
      assert(gid == wid)
      assert(math.abs(gs - BigDecimal(ws).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("evalMetrics computes known values on a hand-built ranks frame") {
    val s = spark
    import s.implicits._
    // 4 queries: ranks 1, 2, miss, 5 -> recall 0.75, mrr (1+0.5+0.2)/4,
    // ndcg (1 + 1/log2(3) + 1/log2(6))/4
    val ranks = Seq(
      (1L, 10L, Some(1L)), (2L, 20L, Some(2L)),
      (3L, 30L, None: Option[Long]), (4L, 40L, Some(5L)))
      .toDF("q_id", "expected_id", "rank")
    val r = Search.evalMetrics(ranks, 5).collect()(0)
    assert(r.getAs[Long]("total") == 4)
    assert(math.abs(r.getAs[Double]("recall_at_k") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("mrr") - (1.0 + 0.5 + 0.2) / 4.0) < 1e-6)
    val wantNdcg = (1.0 + 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(6) / math.log(2))) / 4.0
    assert(math.abs(r.getAs[Double]("ndcg") - wantNdcg) < 1e-6)
  }

  test("goldRanksFor joins arbitrary gold against arbitrary retrieval lists") {
    val s = spark
    import s.implicits._
    val gold = Seq((1L, 100L), (2L, 200L)).toDF("q_id", "expected_id")
    val retrieved = Seq((1L, 100L, 3L), (1L, 101L, 1L), (2L, 999L, 1L))
      .toDF("q_id", "neighbor_id", "rk")
    val ranks = Search.goldRanksFor(gold, retrieved).collect()
      .map(r => r.getAs[Long]("q_id") -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(ranks(1L).contains(3L))
    assert(ranks(2L).isEmpty)
  }

  test("eval_compare counts match a two-retriever replica") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def score(a: Array[Float], b: Array[Float], dot: Boolean): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (dot) d else d / (math.sqrt(na) * math.sqrt(nb))
    }
    def rankOf(qid: Long, qv: Array[Float], expected: Long, dot: Boolean): Option[Long] = {
      val top = emb.filter(_._1 != qid)
        .map(o => (o._1, BigDecimal(score(qv, o._2, dot))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, sc) => (-sc, id) }.take(Search.EvalK)
      val i = top.indexWhere(_._1 == expected)
      if (i >= 0) Some(i + 1L) else None
    }
    val deltas = emb.filter(_._1 < Search.NGold).map { case (qid, qv, lab) =>
      val expected = emb.filter(o => o._3 == lab && o._1 != qid).map(_._1).min
      (rankOf(qid, qv, expected, dot = false), rankOf(qid, qv, expected, dot = true))
    }.map {
      case (None, None) => None
      case (None, Some(_)) => Some(-999L)
      case (Some(_), None) => Some(999L)
      case (Some(l), Some(r)) => Some(r - l)
    }
    val row = Search.evalCompare(spark, dir).collect()(0)
    assert(row.getAs[Long]("regressions_count") == deltas.count(d => d.exists(_ > 0)))
    assert(row.getAs[Long]("improvements_count") == deltas.count(d => d.exists(_ < 0)))
    assert(row.getAs[Long]("changed_count") == deltas.count(d => d.exists(_ != 0)))
  }

  test("eval_recall metrics match a replica computed from raw embeddings") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter(_._1 < Search.NGold)
    val stats = queries.map { case (qid, qv, qlab) =>
      val expected = emb.filter(o => o._3 == qlab && o._1 != qid).map(_._1).min
      val top = emb.filter(_._1 != qid)
        .map(o => (o._1, BigDecimal(cos(qv, o._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, s) => (-s, id) }.take(Search.EvalK)
      val rank = top.indexWhere(_._1 == expected)
      if (rank >= 0) Some(rank + 1) else None
    }
    val total = stats.length.toDouble
    val recall = stats.count(_.isDefined) / total
    val mrr = stats.flatten.map(r => 1.0 / r).sum / total
    val ndcg = stats.flatten.map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum / total
    val row = Search.evalRecall(spark, dir).collect()(0)
    assert(row.getAs[Long]("total") == stats.length)
    assert(math.abs(row.getAs[Double]("recall_at_k") - recall) < 1e-6)
    assert(math.abs(row.getAs[Double]("mrr") - mrr) < 1e-6)
    assert(math.abs(row.getAs[Double]("ndcg") - ndcg) < 1e-6)
  }

  test("search_compare aligns two retrievers and counts the id overlap") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def score(a: Array[Float], b: Array[Float], dot: Boolean): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (dot) d else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = emb.find(_._1 == Search.RrfQueryVec).get._2
    def top(dot: Boolean): Seq[Long] = emb.filter(_._1 != Search.RrfQueryVec)
      .map(o => (o._1, BigDecimal(score(qv, o._2, dot))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, sc) => (-sc, id) }.take(Search.CompareK).map(_._1).toSeq
    val (wantL, wantR) = (top(dot = false), top(dot = true))
    val rows = Search.searchCompare(spark, dir).collect().sortBy(_.getAs[Long]("rk"))
    assert(rows.map(_.getAs[Long]("left_id")).toSeq == wantL)
    assert(rows.map(_.getAs[Long]("right_id")).toSeq == wantR)
    val wantOverlap = wantL.toSet.intersect(wantR.toSet).size.toLong
    assert(rows.forall(_.getAs[Long]("overlap") == wantOverlap))
  }


  test("evalFromFile reproduces eval_recall from an uploaded CSV gold set") {
    // derive the same label-based gold the synthetic eval uses, as a CSV
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val gold = emb.filter(_._1 < Search.NGold).map { case (qid, lab) =>
      qid -> emb.filter(o => o._2 == lab && o._1 != qid).map(_._1).min
    }
    val f = java.nio.file.Files.createTempFile("gold", ".csv")
    java.nio.file.Files.writeString(f,
      "q_id,expected_id\n" + gold.map { case (q, e) => s"$q,$e" }.mkString("\n") + "\n")
    val e = graft.operators.VectorOps.embWithNorm(spark, dir)
    val hits = graft.operators.VectorOps.topK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < Search.NGold),
      Search.EvalK, "cos")
    val fromFile = Search.evalFromFile(spark, f.toString, "csv", hits).collect()(0)
    val builtin = Search.evalRecall(spark, dir).collect()(0)
    Seq("k", "total").foreach(c =>
      assert(fromFile.getAs[Long](c) == builtin.getAs[Long](c)))
    Seq("recall_at_k", "mrr", "ndcg").foreach(c =>
      assert(fromFile.getAs[Double](c) == builtin.getAs[Double](c), c))
  }


  test("evalHits returns per-question verdicts with previewed top hits") {
    val s = spark
    import s.implicits._
    val gold = Seq((1L, 10L), (2L, 99L)).toDF("q_id", "expected_id")
    val retrieved = Seq(
      (1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8),
      (2L, 1L, 20L, 0.7)).toDF("q_id", "rk", "neighbor_id", "score")
    val docs = Seq(
      (10L, "ten " * 100), (11L, "eleven"), (20L, "twenty"))
      .toDF("neighbor_id", "text")
    val rows = Search.evalHits(gold, retrieved, docs, k = 5, show = 2).collect()
    val q1 = rows.filter(_.getAs[Long]("q_id") == 1L).sortBy(_.getAs[Long]("rk"))
    assert(q1.forall(_.getAs[Boolean]("found")))
    assert(q1.forall(_.getAs[Long]("rank") == 1L))
    assert(q1.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L))
    // long doc preview is sliced at 180 + ellipsis
    assert(q1.head.getAs[String]("preview").length == 181)
    assert(q1.head.getAs[String]("preview").endsWith("\u2026"))
    val q2 = rows.filter(_.getAs[Long]("q_id") == 2L)
    assert(q2.forall(!_.getAs[Boolean]("found")))
    assert(q2.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(20L))
  }


  test("bm25TopFor generalizes the fixed-query surface") {
    val fixed = Search.bm25TopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"))).toSeq
    val general = Search.bm25TopFor(spark, dir, Search.QueryText, Search.BmK)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"))).toSeq
    assert(general == fixed)
    val other = Search.bm25TopFor(spark, dir, "merge", 5).collect()
    assert(other.nonEmpty && other.length <= 5)
    assert(other.map(_.getAs[Long]("rk")).toSeq == (1L to other.length).toSeq)
  }


  test("hybridRrfFor with the fixed inputs equals hybrid_rrf") {
    val fixed = Search.hybridRrf(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("id"))).toSeq
    val general = Search.hybridRrfFor(spark, dir, Search.QueryText, Search.RrfQueryVec)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("id"))).toSeq
    assert(general == fixed)
  }

}
