package graft

import graft.functions.WordShingles
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dedup_exact partitions the corpus: n_docs sums to the doc count") {
    val groups = Dedup.dedupExact(spark, dir).collect()
    val docs = Tables.documents(spark, dir).count()
    assert(groups.map(_.getAs[Long]("n_docs")).sum == docs)
    groups.foreach(g => assert(g.getAs[Long]("keep_id") >= 0))
  }

  test("dedup_ngram jaccard matches a set-based replica") {
    val sh = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> WordShingles.shingles(r.getString(1), 3).toSet)
      .filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      m = (sa & sb).size if m > 0
      j = m.toDouble / (sa.size + sb.size - m).toDouble if j >= Dedup.NgramJaccardThreshold
    } yield (a, b) -> j).toMap
    val got = Dedup.dedupNgram(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
  }

  test("edge-whitespace contents tokenize TRIMMED everywhere: 2-real-token " +
      "groups never pair, equal-token norms pair across groups") {
    // "\tfoo bar\n" normalizes to " foo bar " (trim strips spaces only, the
    // \s+ collapse leaves edge spaces) — the r9 advisor input class. The
    // kernel space-trims before splitting, so this content has 2 tokens /
    // zero 3-gram shingles and its verbatim group must emit NO pairs from
    // either arm. Conversely "alpha beta gamma delta\n" is a DIFFERENT
    // verbatim group than the bare form (norm keeps the edge space) with
    // IDENTICAL trimmed tokens, so the rep-pair arm must score them 1.0.
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "\tfoo bar\n"),
      (2L, "\tfoo bar\n"),
      (3L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma delta"),
      (5L, "alpha beta gamma delta\n")).toDF("doc_id", "text")
    val pairs = Dedup.dedupNgramDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(pairs == Set((3L, 4L, 1.0), (3L, 5L, 1.0), (4L, 5L, 1.0)),
      s"got $pairs")
    // the component graph agrees: docs 1-2 are isolated, 3-4-5 connect
    val edges = Dedup.ngramComponentEdgesDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!edges.exists(e => e._1 <= 2 || e._2 <= 2), s"got $edges")
    assert(edges.nonEmpty)
    // substring ntok counts trimmed (real) tokens only
    val ntoks = Dedup.dedupSubstringDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(ntoks(1L) == 2L && ntoks(3L) == 4L && ntoks(5L) == 4L, s"got $ntoks")
  }

  test("grouped pair forms expand to exactly the audit pair sets") {
    // The production (grouped) form must be information-equivalent to the
    // audit expansion: joining members back recovers EXACTLY the audit
    // pair multiset, and sum(n_pairs) == the audit row count. One check
    // per family, same expansion code.
    import org.apache.spark.sql.DataFrame
    def expand(grouped: DataFrame, valueCol: String): Set[(Long, Long, Double)] = {
      val mem = graft.sources.Tables.documents(spark, dir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(
              org.apache.spark.sql.functions.col("text"))), "\\s+", " ").as("norm"))
        .collect().groupBy(_.getString(1))
        .map { case (_, rs) => val ids = rs.map(_.getLong(0)).sorted; ids.min -> ids }
      grouped.collect().flatMap { r =>
        val (ra, rb) = (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b"))
        val v = r.getAs[Any](valueCol) match {
          case d: Double => d; case l: Long => l.toDouble
        }
        assert(r.getAs[Long]("n_docs_a") == mem(ra).length.toLong)
        assert(r.getAs[Long]("n_docs_b") == mem(rb).length.toLong)
        val pairs: Seq[(Long, Long, Double)] =
          if (ra == rb) {
            val ids = mem(ra)
            assert(r.getAs[Long]("n_pairs") == ids.length.toLong * (ids.length - 1) / 2)
            for (i <- ids.indices; j <- (i + 1) until ids.length)
              yield (ids(i), ids(j), v)
          } else {
            assert(r.getAs[Long]("n_pairs") == mem(ra).length.toLong * mem(rb).length)
            (for (a <- mem(ra); b <- mem(rb))
              yield (math.min(a, b), math.max(a, b), v)).toSeq
          }
        pairs
      }.toSet
    }
    def audit(df: DataFrame, valueCol: String): Set[(Long, Long, Double)] =
      df.collect().map { r =>
        val v = r.getAs[Any](valueCol) match {
          case d: Double => d; case l: Long => l.toDouble
        }
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), v)
      }.toSet
    for ((g, a, vc) <- Seq(
        (Dedup.dedupNgramGrouped(spark, dir), Dedup.dedupNgram(spark, dir), "jaccard"),
        (Dedup.dedupMinhashGrouped(spark, dir), Dedup.dedupMinhash(spark, dir), "n_shared_bands"),
        (Dedup.dedupVerifiedGrouped(spark, dir), Dedup.dedupVerified(spark, dir), "jaccard"),
        (Dedup.dedupSimhashGrouped(spark, dir), Dedup.dedupSimhash(spark, dir), "hamming"))) {
      val ex = expand(g, vc)
      val au = audit(a, vc)
      assert(ex == au, s"$vc: grouped expansion != audit pairs " +
        s"(${(ex -- au).take(3)} extra, ${(au -- ex).take(3)} missing)")
      val nPairs = g.select(org.apache.spark.sql.functions.sum("n_pairs"))
        .collect().head.getLong(0)
      assert(nPairs == a.count(), s"$vc: sum(n_pairs) != audit row count")
    }
  }

  test("expandGrouped recovers the audit pairs from any grouped slice") {
    val docs = Tables.documents(spark, dir)
    // full expansion == the audit operator, row for row
    val full = Dedup.expandGrouped(docs,
        Dedup.dedupNgramGroupedDf(docs), "jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val audit = Dedup.dedupNgramDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(full == audit)
    // a filtered slice expands to exactly the matching audit subset
    import org.apache.spark.sql.functions.col
    val strong = Dedup.expandGrouped(docs,
        Dedup.dedupNgramGroupedDf(docs).filter(col("jaccard") >= 0.5),
        "jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(strong == audit.filter(_._3 >= 0.5))
    assert(strong.size < full.size || audit.forall(_._3 >= 0.5))
  }

  test("dedup_minhash candidates are deterministic and well-formed") {
    val a = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_shared_bands")))
      .sortBy(x => (x._1, x._2))
    val b = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_shared_bands")))
      .sortBy(x => (x._1, x._2))
    assert(a.sameElements(b))
    a.foreach { case (x, y, nb) =>
      assert(x < y); assert(nb >= 1 && nb <= Dedup.Bands)
    }
  }

  test("minhash finds the high-jaccard near-duplicates LSH promises") {
    // With 4 rows/band, a pair with J >= 0.9 collides in >= 1 of 4 bands
    // with prob ~1 - (1 - 0.9^4)^4 ~ 0.98; the sf0.001 corpus near-dups
    // (J ~ 0.99) must be found.
    val nearDups = Dedup.dedupNgram(spark, dir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val cand = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nearDups.nonEmpty, "testdata should contain near-duplicates")
    assert(nearDups.subsetOf(cand),
      s"missed near-dups: ${nearDups -- cand}")
  }

  test("dedup_clusters equals a union-find over the near-dup pairs") {
    val pairs = Dedup.dedupNgram(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(d => d -> find(d)).toMap
    val got = Dedup.dedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Boolean]("keep"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (d, (rep, keep)) =>
      assert(rep == want(d), s"doc $d")
      assert(keep == (d == rep))
    }
    // exactly one keeper per cluster
    assert(got.values.count(_._2) == want.values.toSet.size)
  }

  test("dedup_clusters_lsh equals union-find over the verified pairs and " +
    "refines the exact partition (gate corpora)") {
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      // ground truth: union-find over the member-expanded verified pair set
      val pairs = Dedup.dedupVerified(spark, d).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val lsh = Dedup.dedupClustersLsh(spark, d).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster_rep"), r.getAs[Boolean]("keep"))).toMap
      assert(lsh.keySet == want.keySet, s"$d: vertex sets differ")
      lsh.foreach { case (doc, (rep, keep)) =>
        assert(rep == want(doc), s"$d: doc $doc")
        assert(keep == (doc == rep))
      }
      // refinement vs the exact form: every verified edge is an exact
      // n-gram edge (precision 1), so LSH clusters sit INSIDE exact
      // clusters — they can split (missed bridge pairs, dedup_recall's
      // number) but never merge docs the exact form separates — and
      // every exact keeper (min of its exact cluster, hence min of its
      // own LSH sub-cluster) keeps under LSH too.
      val exact = Dedup.dedupClusters(spark, d).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster_rep"), r.getAs[Boolean]("keep"))).toMap
      assert(lsh.keySet.subsetOf(exact.keySet), s"$d: LSH saw extra docs")
      lsh.groupBy(_._2._1).foreach { case (rep, members) =>
        val exReps = members.keys.map(exact(_)._1).toSet
        assert(exReps.size == 1, s"$d: LSH cluster $rep spans exact clusters $exReps")
      }
      exact.foreach { case (doc, (_, exKeep)) =>
        if (exKeep && lsh.contains(doc))
          assert(lsh(doc)._2, s"$d: exact keeper $doc dropped by LSH")
      }
    }
  }

  test("ngram component edges give the full pair graph's components (sparse)") {
    val s = spark
    import s.implicits._
    // Two verbatim groups whose contents are near-duplicates of each other
    // (must merge into ONE component via the rep edge + stars), one
    // isolated doc, and a verbatim group of <3-token texts (no shingles —
    // must produce NO component at all, as the full graph has no pairs).
    val txtA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val txtB = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = (
      (1L to 5L).map(i => (i, txtA)) ++
      (11L to 13L).map(i => (i, txtB)) ++
      Seq((21L, "completely different content about ships and sails and sea travel")) ++
      (31L to 33L).map(i => (i, "too short"))
    ).toDF("doc_id", "text")
    val full = Dedup.dedupNgramDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // union-find over the FULL pair graph = expected components
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    full.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(d => d -> find(d)).toMap
    val got = Dedup.clustersFromPairs(Dedup.ngramComponentEdgesDf(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(got == want)
    assert(want.values.toSet == Set(1L), "near-dup verbatim groups must merge into one component")
    assert(!got.keySet.exists(_ >= 21L), "isolated and shingle-less docs must not appear")
  }

  test("dedup_simhash pairs are within the hamming budget and symmetric-free") {
    val rows = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    rows.foreach { case (a, b, h) =>
      assert(a < b); assert(h >= 0 && h <= Dedup.SimhashMaxHamming)
    }
    assert(rows.map(x => (x._1, x._2)).distinct.length == rows.length)
  }

  test("dedup_embedding agrees with a cosine replica at the threshold") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (a, va) <- emb; (b, vb) <- emb if a < b
      c = cos(va, vb) if c >= Dedup.EmbeddingCosThreshold
    } yield (a, b)).toSet
    val got = Dedup.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"))).toSet
    assert(got == want)
  }

  test("dedup_embedding refuses to run above the audit-scale row cap") {
    import org.apache.spark.sql.functions.{array, lit}
    val big = spark.range(Dedup.EmbeddingAuditMaxRows + 1)
      .select(org.apache.spark.sql.functions.col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException](Dedup.dedupEmbeddingDf(big))
    assert(e.getMessage.contains("dedup_embedding_lsh"),
      "guard must point callers at the LSH serving path")
  }

  test("dedup_minhash drops a synthetic hot bucket without materializing it") {
    val s = spark
    import s.implicits._
    // 300 DISTINCT texts dominated by one long shared boilerplate block:
    // every minhash minimum comes from the shared shingles, so all 300
    // contents key the same band buckets — >cap distinct contents =
    // degenerate boilerplate, dropped. One legitimate near-identical pair
    // must survive the guard.
    val boilerBase = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val boiler = (1L to 300L).map(i => (i, s"$boilerBase variant$i"))
    val legit = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val docs = (boiler ++ legit).toDF("doc_id", "text")
    val pairs = Dedup.dedupMinhashDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1001L, 1002L)), "legitimate pair must survive")
    assert(!pairs.exists(p => p._1 <= 300 || p._2 <= 300),
      s"over-cap bucket must produce no pairs, got ${pairs.size}")
  }

  test("dedup_minhash reports verbatim-duplicate groups the doc-level guard lost") {
    val s = spark
    import s.implicits._
    // 300 verbatim copies of one page is TRUE duplication, not a hot
    // bucket: the stop guard counts distinct contents (1 here), so every
    // member pair must come back, sharing all 4 bands — at O(contents)
    // LSH cost, since the quadratic stage never sees member rows.
    val copies = (1L to 300L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val pairs = Dedup.dedupMinhashDf(copies.toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_shared_bands")))
    assert(pairs.length == 300 * 299 / 2)
    pairs.foreach { case (a, b, n) => assert(a < b && n == Dedup.Bands.toLong) }
    // and the two-stage verified form scores them all at exactly 1.0
    val ver = Dedup.dedupVerifiedDf(copies.toDF("doc_id", "text")).collect()
    assert(ver.length == 300 * 299 / 2)
    ver.foreach(r => assert(r.getAs[Double]("jaccard") == 1.0))
  }

  test("dedup_embedding_lsh drops a synthetic hot bucket without materializing it") {
    val s = spark
    import s.implicits._
    // 300 identical all-positive vectors land on the all-ones sign code —
    // the structural degenerate bucket; one near-identical pair elsewhere
    // must survive.
    val dim = 4
    val boiler = (1L to 300L).map(i => (i, Array(1.0f, 1.0f, 1.0f, 1.0f)))
    val legit = Seq(
      (1001L, Array(-0.9f, 0.8f, -0.7f, 0.6f)),
      (1002L, Array(-0.9f, 0.8f, -0.7f, 0.6f)))
    val emb = (boiler ++ legit).toDF("vec_id", "embedding")
    val pairs = Dedup.dedupEmbeddingLshDf(emb, dim).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"))).toSet
    assert(pairs.contains((1001L, 1002L)), "legitimate pair must survive")
    assert(!pairs.exists(p => p._1 <= 300 || p._2 <= 300),
      s"over-cap bucket must produce no pairs, got ${pairs.size}")
  }

  test("dedup_verified = exact jaccard restricted to minhash candidates") {
    val cand = graft.operators.Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = graft.operators.Dedup.dedupNgram(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val got = graft.operators.Dedup.dedupVerified(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    // verified pairs = candidate pairs whose exact jaccard clears tau
    got.keys.foreach(p => assert(cand.contains(p), s"$p not a candidate"))
    got.foreach { case (p, j) =>
      val want = BigDecimal(exact(p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == want, s"$p jaccard")
    }
    val expected = cand.filter(p => exact.contains(p))
    assert(got.keySet == expected)
  }


  test("dedup_recall: verified pairs are a subset of exact pairs (precision 1)") {
    val exact = Dedup.dedupNgram(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val verified = Dedup.dedupVerified(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(verified.subsetOf(exact), "verify stage admitted a non-pair")
    val r = Dedup.dedupRecall(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_exact_pairs") == exact.size.toLong)
    assert(r.getAs[Long]("n_lsh_pairs") == verified.size.toLong)
    assert(r.getAs[Long]("n_hit") == verified.size.toLong, "precision must be 1")
    val want = BigDecimal(verified.size.toDouble / exact.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("recall") == want)
  }

  test("clustersFromPairs clusters any pair shape (here: the simhash pairs)") {
    val pairs = Dedup.dedupSimhash(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
    val got = Dedup.clustersFromPairs(pairs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Boolean]("keep")))
    // union-find replica
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map(n => (n, find(n), n == find(n))).toSet
    assert(got.toSet == want)
    assert(got.length == nodes.length)
  }

  test("frame-based dedup API works on an arbitrary (doc_id, text) frame") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "completely different words about spark shuffles and parquet files here"),
      (4L, "The  Quick   Brown Fox jumps over the lazy dog near the river bank".toLowerCase)
    ).toDF("doc_id", "text")
    // exact: 1 and 4 normalize identically
    val ex = Dedup.dedupExactDf(docs).collect()
    assert(ex.length == 3)
    assert(ex.exists(r => r.getAs[Long]("keep_id") == 1L && r.getAs[Long]("n_docs") == 2L))
    // ngram: 1-2 and 1-4 and 2-4 are near-dups; 3 is not
    val ng = Dedup.dedupNgramDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(ng.contains((1L, 2L)) && ng.contains((1L, 4L)))
    assert(!ng.exists(p => p._1 == 3L || p._2 == 3L))
    // two-stage verified pipeline proposes and confirms the same pairs
    val ver = Dedup.dedupVerifiedDf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(ver.subsetOf(ng))
    assert(ver.contains((1L, 4L)), "identical docs must survive LSH + verify")
  }
  test("dedup_cluster_stats histogram replays the cluster table") {
    val sizes = Dedup.dedupClusters(spark, dir).collect()
      .groupBy(_.getAs[Long]("cluster_rep")).map(_._2.length.toLong)
    val want = sizes.groupBy(identity).map { case (sz, g) =>
      (sz, g.size.toLong, sz * g.size, (sz - 1) * g.size)
    }.toSet
    val got = Dedup.dedupClusterStats(spark, dir).collect().map(r =>
      (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_redundant"))).toSet
    assert(got == want)
    // every clustered doc is accounted for exactly once
    assert(got.toSeq.map(_._3).sum == sizes.sum)
  }
  test("dedup_embedding_lsh has precision 1 vs the exact pair set") {
    val exact = Dedup.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    val lsh = Dedup.dedupEmbeddingLsh(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    assert(lsh.nonEmpty)
    // the exact-cosine verify makes every emitted pair a true pair with
    // the identical score (candidates ⊆ all pairs, same threshold)
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    lsh.foreach { case (a, b, _) => assert(a < b, "pair order canonical") }
  }

  test("embedding LSH hyperplanes and chunk keys are deterministic and bounded") {
    assert((0 until Dedup.EmbLshBits).forall(k =>
      Dedup.hyperplane(k, 3) == Dedup.hyperplane(k, 3)))
    assert((0 until Dedup.EmbLshBits).forall(k =>
      math.abs(Dedup.hyperplane(k, 7)) == 1.0))
    // two runs produce the same pair set (no randomness anywhere)
    val p1 = Dedup.dedupEmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = Dedup.dedupEmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == p2)
  }
}
