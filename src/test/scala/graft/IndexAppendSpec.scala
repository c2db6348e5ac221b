package graft

import org.apache.spark.sql.functions._

import graft.index.IndexStore
import graft.operators.VectorOps
import graft.sources.Tables

/** IndexStore.append: incremental growth with FROZEN quantizers — new
  * vectors are assigned with the persisted centroids/codebooks (no refit),
  * appended to the latest cell partitions, and recorded as a delta
  * version with parent provenance. Queries probing only cells the append
  * never touched must see bit-identical results.
  */
class IndexAppendSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def embs = Tables.embeddings(spark, dir)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("flat append: rows accumulate, manifest count and version meta update") {
    val root = java.nio.file.Files.createTempDirectory("graft_app_flat").toString
    val a = embs.filter(col("id") < 100)
    val b = embs.filter(col("id") >= 100)
    val m0 = IndexStore.build(a, root, "idx", "flat")
    val m1 = IndexStore.append(b, root, "idx")
    assert(m1.count == embs.count())
    assert(m1.backend == "flat" && m1.dim == m0.dim)
    assert(IndexStore.load(spark, root, "idx").count() == m1.count)
    // manifest on disk reflects the append
    assert(IndexStore.manifest(root, "idx").count == m1.count)
    // two versions; the new one is a delta with parent provenance
    val vs = IndexStore.versions(root, "idx")
    assert(vs.length == 2)
    assert(IndexStore.load(spark, root, "idx", Some(vs.last)).count() ==
      b.count())
    val meta = IndexStore.versionMeta(root, "idx", vs.last).get
    assert(meta.contains(s""""parent": "${vs.head}""""))
    assert(meta.contains(s""""appended": ${b.count()}"""))
    // the delta version's manifest describes the DELTA dir it sits in:
    // count == rows actually in the dir, flagged delta with parent +
    // post-append total (load(version) must agree with its own manifest)
    assert(IndexStore.manifest(root, "idx", Some(vs.last)).count == b.count())
    val vj = IndexStore.manifestJson(root, "idx", Some(vs.last))
    assert(vj.contains("\"delta\": true"))
    assert(vj.contains(s""""parent": "${vs.head}""""))
    assert(vj.contains(s""""total_count": ${m1.count}"""))
    // the full-build version and latest stay non-delta with the total
    assert(IndexStore.manifest(root, "idx", Some(vs.head)).count == a.count())
    assert(!IndexStore.manifestJson(root, "idx", None).contains("\"delta\""))
  }

  test("loadResolved walks the delta chain to the point-in-time index") {
    val root = java.nio.file.Files.createTempDirectory("graft_app_res").toString
    val a = embs.filter(col("id") < 100)
    val b = embs.filter(col("id") >= 100 && col("id") < 200)
    val c = embs.filter(col("id") >= 200)
    IndexStore.build(a, root, "idx", "ivf")
    IndexStore.append(b, root, "idx")
    IndexStore.append(c, root, "idx")
    val vs = IndexStore.versions(root, "idx")
    assert(vs.length == 3)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    // full-build version resolves to itself
    assert(ids(IndexStore.loadResolved(spark, root, "idx", vs(0))) == ids(a))
    // one delta hop: build + first append
    assert(ids(IndexStore.loadResolved(spark, root, "idx", vs(1))) ==
      ids(a) ++ ids(b))
    // two hops == latest, row-for-row (cell assignments carried through)
    val resolved = IndexStore.loadResolved(spark, root, "idx", vs(2))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("cell"))).sorted.toSeq
    val latest = IndexStore.load(spark, root, "idx")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("cell"))).sorted.toSeq
    assert(resolved == latest)
    // a delta manifest parses as strict JSON (the toJsonWith template —
    // no string-surgery appendage outside the object)
    val vj = IndexStore.manifestJson(root, "idx", Some(vs(2)))
    assert(vj.trim.startsWith("{") && vj.trim.endsWith("}"))
    assert(vj.indexOf("\"delta\": true") > 0 &&
      vj.indexOf("\"delta\": true") < vj.lastIndexOf("}"))
  }

  test("ivfpq append assigns with the persisted models, not a refit") {
    val root = java.nio.file.Files.createTempDirectory("graft_app_pq").toString
    val maxId = embs.agg(max(col("id"))).head.getLong(0)
    val a = embs.filter(col("id") <= maxId - 5)
    val b = embs.filter(col("id") > maxId - 5)
    IndexStore.build(a, root, "idx", "ivfpq")
    val centsA = IndexStore.loadCentroids(spark, root, "idx")
    val cbA = IndexStore.loadCodebooks(spark, root, "idx")

    val queries = embs.filter(col("id") < 10)
    val before = IndexStore.adcSearch(spark, root, "idx", queries, VectorOps.DefaultK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)

    IndexStore.append(b, root, "idx")
    // models unchanged by the append
    assert(IndexStore.loadCentroids(spark, root, "idx").zip(centsA)
      .forall { case (x, y) => x.sameElements(y) })

    // appended rows carry exactly the frozen-model assignment
    val bIds = b.collect().map(_.getLong(0)).toSet
    val appended = IndexStore.load(spark, root, "idx")
      .filter(col("id").isin(bIds.toSeq: _*))
    val expect = b.select(col("id"),
        element_at(graft.functions.IvfProbes.column(col("vec"), centsA, 1), 1)("cell")
          .cast("int").as("cell"),
        transform(graft.functions.PqCodes.column(col("vec"), cbA), p => p("code"))
          .as("codes"))
    val gotRows = appended.collect()
      .map(r => (r.getAs[Long]("id"),
        r.getAs[Int]("cell"), r.getAs[Seq[Long]]("codes"))).sortBy(_._1).toSeq
    val expRows = expect.collect()
      .map(r => (r.getAs[Long]("id"),
        r.getAs[Int]("cell"), r.getAs[Seq[Long]]("codes"))).sortBy(_._1).toSeq
    assert(gotRows == expRows)

    // queries whose probed cells the append never touched are bit-identical
    val bCells = expRows.map(_._2).toSet
    val nprobe = VectorOps.NProbe
    val probed = queries.select(col("id"),
        transform(graft.functions.IvfProbes.column(col("vec"), centsA, nprobe),
          p => p("cell")).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val untouched = probed.collect {
      case (q, cells) if cells.intersect(bCells).isEmpty => q
    }.toSet
    assert(untouched.nonEmpty,
      s"fixture regression: every query probes an appended cell ($bCells)")
    val after = IndexStore.adcSearch(spark, root, "idx", queries, VectorOps.DefaultK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    untouched.foreach { q =>
      assert(after(q).sortBy(_._2).toSeq == before(q).sortBy(_._2).toSeq,
        s"query $q probes only untouched cells but its results changed")
    }
  }

  test("ivf append partitions new rows into existing cell layout") {
    val root = java.nio.file.Files.createTempDirectory("graft_app_ivf").toString
    val a = embs.filter(col("id") % 2 === 0)
    val b = embs.filter(col("id") % 2 === 1)
    IndexStore.build(a, root, "idx", "ivf")
    val cents = IndexStore.loadCentroids(spark, root, "idx")
    assert(cents.nonEmpty) // build now persists the centroid sidecar
    IndexStore.append(b, root, "idx")
    val idx = IndexStore.load(spark, root, "idx")
    assert(idx.count() == embs.count())
    // appended assignment == exact coarse argmin under the frozen fit
    val expect = VectorOps.assignCells(
        b.select(col("id"), col("vec").as("embedding")), cents)
      .select(col("id"), col("cell").cast("int").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bIds = expect.keySet
    idx.filter(col("id").isin(bIds.toSeq: _*)).collect().foreach { r =>
      assert(r.getAs[Int]("cell") == expect(r.getAs[Long]("id")))
    }
  }
}
