package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqModel, VectorOps}
import graft.sources.Tables

class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb: Array[(Long, Array[Float])] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

  private lazy val cb = PqModel.codebooks(spark, dir)

  /** Scala replica of the PqCodes kernel rules: rounded-d2 argmin, ties to
    * the lower code.
    */
  private def assign(v: Array[Float]): Array[(Int, Double)] =
    Array.tabulate(PqModel.SubSpaces) { m =>
      val scored = cb(m).zipWithIndex.map { case (cent, code) =>
        var acc = 0.0
        var j = 0
        while (j < cent.length) {
          val t = v(m * PqModel.SubDim + j).toDouble - cent(j)
          acc += t * t; j += 1
        }
        (code, BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      scored.minBy { case (code, d2) => (d2, code) }
    }

  test("codebooks have the canonical shape and 6dp-rounded values") {
    assert(cb.length == PqModel.SubSpaces)
    cb.foreach { book =>
      assert(book.length == PqModel.Codes)
      book.foreach { c =>
        assert(c.length == PqModel.SubDim)
        c.foreach(v => assert(
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble == v))
      }
    }
    // pure function of (dir) -> identical on refit
    val again = PqModel.codebooks(spark, dir)
    assert(cb.zip(again).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("vec_pq codes and error match the scala replica") {
    val got = VectorOps.vecPq(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((0 until PqModel.SubSpaces).map(m => r.getAs[Long](s"code$m")),
          r.getAs[Double]("err_l2"))).toMap
    assert(got.size == emb.length)
    emb.take(50).foreach { case (id, v) =>
      val want = assign(v)
      assert(got(id)._1 == want.map(_._1.toLong).toSeq, s"codes of vec $id")
      val err = BigDecimal(math.sqrt(want.map(_._2).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._2 == err, s"err_l2 of vec $id")
    }
  }

  test("ann_pq ranks ADC scores of the assigned codes") {
    val rows = VectorOps.annPq(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == emb.filter(_._1 < 10).map(_._1).toSet)
    val nsq = PqModel.normSq(cb)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to VectorOps.DefaultK).toSeq)
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == qid), "self excluded")
      val scores = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, "descending")
      // replica of the top hit's ADC score
      val top = rs.minBy(_.getAs[Long]("rk"))
      val qv = emb.find(_._1 == qid).get._2
      val nv = emb.find(_._1 == top.getAs[Long]("neighbor_id")).get._2
      val codes = assign(nv).map(_._1)
      var dot = 0.0; var rec = 0.0; var qn = 0.0
      for (m <- 0 until PqModel.SubSpaces) {
        val cent = cb(m)(codes(m))
        var acc = 0.0
        for (j <- 0 until PqModel.SubDim)
          acc += qv(m * PqModel.SubDim + j).toDouble * cent(j)
        dot += acc; rec += nsq(m)(codes(m))
      }
      qv.foreach(x => qn += x.toDouble * x.toDouble)
      val want = BigDecimal(dot / (math.sqrt(qn) * math.sqrt(rec)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(top.getAs[Double]("score") == want, s"ADC score of q $qid")
    }
  }

  test("pq_recall is n_hit / n_exact with full top-k sets on both sides") {
    val r = VectorOps.pqRecall(spark, dir).collect()(0)
    val k = VectorOps.DefaultK.toLong
    val nq = emb.count(_._1 < 10).toLong
    assert(r.getAs[Long]("n_exact") == k * nq)
    assert(r.getAs[Long]("n_approx") == k * nq)
    val hit = r.getAs[Long]("n_hit")
    assert(hit >= 0 && hit <= k * nq)
    val want = BigDecimal(hit.toDouble / (k * nq))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("recall") == want)
  }

  test("PqCodes breaks rounded-d2 ties toward the lower code") {
    import spark.implicits._
    // two identical centroids per subspace -> every vector ties; code 0 wins
    val flat = Array.fill(PqModel.SubSpaces)(
      Array.fill(2)(Array.fill(PqModel.SubDim)(0.5)))
    val df = Seq((1L, Array.fill(PqModel.SubSpaces * PqModel.SubDim)(1.0f)))
      .toDF("vec_id", "embedding")
    val pc = df.select(graft.functions.PqCodes.column(col("embedding"), flat).as("pc"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(pc.map(_.getAs[Long]("code")).toSeq == Seq.fill(PqModel.SubSpaces)(0L))
  }

  test("ann_ivfpq returns ADC-scored neighbors only from probed cells") {
    import graft.operators.IvfModel
    val cents = IvfModel.centroids(spark, dir)
    def cell(v: Array[Float]): Int = {
      val d2 = cents.map { c =>
        var acc = 0.0
        for (j <- c.indices) { val t = v(j).toDouble - c(j); acc += t * t }
        BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }
    def probes(v: Array[Float], n: Int): Set[Int] = {
      val d2 = cents.map { c =>
        var acc = 0.0
        for (j <- c.indices) { val t = v(j).toDouble - c(j); acc += t * t }
        BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      d2.zipWithIndex.sortBy { case (d, i) => (d, i) }.take(n).map(_._2).toSet
    }
    val byId = emb.toMap
    val rows = VectorOps.annIvfPq(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == emb.filter(_._1 < 10).map(_._1).toSet)
    byQ.foreach { case (qid, rs) =>
      val pr = probes(byId(qid), VectorOps.NProbe)
      rs.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != qid)
        assert(pr.contains(cell(byId(nb))), s"neighbor $nb of $qid outside probed cells")
      }
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length).toSeq)
      val scores = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("fitFromDf rejects a dim not divisible into subspaces") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(62)(0.1f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      PqModel.fitFromDf(df, "id", "vec")
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("fit tolerates fewer sample rows than codes (init cycles the sample)") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.fill(PqModel.SubSpaces * PqModel.SubDim)(0.25f)),
      (2L, Array.fill(PqModel.SubSpaces * PqModel.SubDim)(0.75f)))
      .toDF("id", "vec")
    val books = PqModel.fitFromDf(df, "id", "vec")
    assert(books.length == PqModel.SubSpaces)
    books.foreach(b => assert(b.length == PqModel.Codes))
  }

  test("ivfpq_recall measures the stacked path against exact top-k") {
    val r = VectorOps.ivfpqRecall(spark, dir).collect()(0)
    val k = VectorOps.DefaultK.toLong
    val nq = emb.count(_._1 < 10).toLong
    assert(r.getAs[Long]("n_exact") == k * nq)
    val hit = r.getAs[Long]("n_hit")
    assert(hit >= 0 && hit <= r.getAs[Long]("n_approx"))
    // the stacked path can't out-recall the measurement bound
    assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
  }

  test("ann_ivfpq_rerank re-scores the ADC shortlist with exact cosine") {
    val rerank = VectorOps.annIvfPqRerank(spark, dir).collect()
    val adc = VectorOps.annIvfPq(spark, dir).collect()
    // shape: top-k per query, ranks 1..k, same query set as the ADC path
    val byQ = rerank.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == adc.map(_.getAs[Long]("q_id")).toSet)
    byQ.values.foreach { rows =>
      assert(rows.length <= VectorOps.DefaultK)
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
    // every re-ranked neighbor is scored by EXACT cosine: replicate from
    // the collected embeddings
    val vecs = emb.toMap
    rerank.foreach { r =>
      val q = vecs(r.getAs[Long]("q_id"))
      val n = vecs(r.getAs[Long]("neighbor_id"))
      val dot = q.zip(n).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val exact = dot / (math.sqrt(q.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(n.map(x => x.toDouble * x.toDouble).sum))
      assert(math.abs(r.getAs[Double]("score") -
        BigDecimal(exact).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("rerank recall dominates the plain IVF-PQ recall") {
    val plain = VectorOps.ivfpqRecall(spark, dir).collect()(0).getAs[Double]("recall")
    val rr = VectorOps.ivfpqRerankRecall(spark, dir).collect()(0).getAs[Double]("recall")
    assert(rr >= plain,
      s"rerank recall $rr must be >= plain ivfpq recall $plain")
  }
}
