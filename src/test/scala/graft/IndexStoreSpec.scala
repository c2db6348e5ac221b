package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.index.IndexStore

class IndexStoreSpec extends SparkSpec {

  private def vectors = {
    val s = spark
    import s.implicits._
    (0L until 100L).map(i =>
      (i.toString, Array.tabulate(8)(d => (math.sin(i * 31 + d) * 10).toFloat)))
      .toDF("id", "vec")
  }

  test("flat index round-trips vectors and writes a manifest + version") {
    val root = Files.createTempDirectory("graft-idx").toString
    val m = IndexStore.build(vectors, root, "flat_test", "flat", model = "stub-model")
    assert(m.count == 100 && m.dim == 8 && m.backend == "flat")

    val loaded = IndexStore.load(spark, root, "flat_test")
    assert(loaded.count() == 100)
    assert(loaded.columns.toSet == Set("id", "vec", "cell"))

    val mj = IndexStore.manifestJson(root, "flat_test")
    assert(mj.contains("\"model\": \"stub-model\"") && mj.contains("\"dim\": 8"))

    val vs = IndexStore.versions(root, "flat_test")
    assert(vs.length == 1)
    assert(IndexStore.load(spark, root, "flat_test", Some(vs.head)).count() == 100)
    assert(Files.exists(java.nio.file.Paths.get(
      s"$root/flat_test/versions/${vs.head}/meta.json")))
  }

  test("ivf index is partitioned by cell and probe prunes to chosen cells") {
    val root = Files.createTempDirectory("graft-idx").toString
    val m = IndexStore.build(vectors, root, "ivf_test", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    assert(m.backend == "ivf" && m.params.nlist == 4)

    // partitioned layout on disk: cell=N subdirectories
    val dirs = new java.io.File(s"$root/ivf_test/latest/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.nonEmpty)

    val idx = IndexStore.load(spark, root, "ivf_test")
    val cells = idx.select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    assert(cells.nonEmpty)
    val probed = IndexStore.probe(idx, Seq(cells.head))
    assert(probed.count() > 0 && probed.count() < 100)
    // the cell filter must reach the scan as a partition filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
  }

  test("ivf_hier backend: same partitioned layout, assignments mostly match ivf") {
    val root = Files.createTempDirectory("graft-idx").toString
    val m = IndexStore.build(vectors, root, "hier_test", "ivf_hier",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    assert(m.backend == "ivf_hier")
    val dirs = new java.io.File(s"$root/hier_test/latest/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.nonEmpty, "hier build must keep the cell-partitioned layout")
    // every vector is assigned, and the cells agree with the flat build
    // for the vast majority (the two-probe trade, pinned corpus-wide by
    // ivf_hier_agreement)
    IndexStore.build(vectors, root, "flat_ref", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val hier = IndexStore.load(spark, root, "hier_test")
      .select(col("id"), col("cell")).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val flat = IndexStore.load(spark, root, "flat_ref")
      .select(col("id"), col("cell")).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hier.keySet == flat.keySet)
    val agree = hier.count { case (id, c) => flat(id) == c }
    assert(agree.toDouble / hier.size > 0.5, s"agreement $agree/${hier.size}")
    // manifest dispatch: search works through the persisted backend
    val manifest = IndexStore.manifestJson(root, "hier_test", None)
    assert(manifest.contains("\"backend\": \"ivf_hier\""))
  }

  test("unknown backend raises like the reference loader, never degrades to flat") {
    val root = Files.createTempDirectory("graft-idx").toString
    val e = intercept[IllegalArgumentException] {
      IndexStore.build(vectors, root, "idx", "hnsw")
    }
    assert(e.getMessage.contains("Unknown backend: hnsw"))
    assert(e.getMessage.contains("flat, ivf, ivf_hier, ivfpq"))
  }

  test("tuned probe dials + measured recall round-trip through the manifest") {
    val root = Files.createTempDirectory("graft-idx").toString
    // a ProbeDialReport `--target` result persisted at build time
    IndexStore.build(vectors, root, "dialed", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2,
        assignProbes = 5, superProbes = 3),
      measuredRecall = 0.835)
    val m = IndexStore.manifest(root, "dialed")
    assert(m.params.assignProbes == 5 && m.params.superProbes == 3)
    assert(math.abs(m.measuredRecall - 0.835) < 1e-9)
    // the serving default is the tuned dial, not the build nprobe
    assert(m.servingProbes == 5)
    // an untuned build serves at its nprobe and records "unset" dials
    IndexStore.build(vectors, root, "rule", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val r = IndexStore.manifest(root, "rule")
    assert(r.params.assignProbes == -1 && r.params.superProbes == -1)
    assert(r.servingProbes == 2 && r.measuredRecall == -1.0)
    assert(IndexStore.manifestJson(root, "rule")
      .contains("\"measured_recall\": null"))
    // append carries the dials forward into the updated manifest
    IndexStore.append(vectors.limit(5)
      .withColumn("id", concat(lit("n"), col("id"))), root, "dialed")
    assert(IndexStore.manifest(root, "dialed").params.assignProbes == 5)
  }

  test("HNSW config knobs persist in the manifest for reference parity") {
    // The reference accepts M/ef_construction/ef_search (schema.py:18-20,
    // api/files.py:25-27) and writes them into every manifest's params
    // block (pipeline.py:96-98) even though its loader raises on the hnsw
    // backend (loader.py:10,19) — config-surface parity means the knobs
    // round-trip here too, while "hnsw" keeps failing the loader contract
    // (previous test).
    val root = Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors, root, "knobs", "flat",
      params = IndexStore.Params(nlist = 4, nprobe = 2,
        m = 32, efConstruction = 400, efSearch = 128))
    val m = IndexStore.manifest(root, "knobs")
    assert(m.params.m == 32 && m.params.efConstruction == 400 &&
      m.params.efSearch == 128)
    val mj = IndexStore.manifestJson(root, "knobs")
    assert(mj.contains("\"M\": 32") && mj.contains("\"efConstruction\": 400")
      && mj.contains("\"efSearch\": 128"))
    // defaults mirror the reference's schema defaults
    IndexStore.build(vectors, root, "knobs_dflt", "flat")
    val d = IndexStore.manifest(root, "knobs_dflt").params
    assert(d.m == 16 && d.efConstruction == 200 && d.efSearch == 64)
  }

  test("pre-dial manifests (no dial/recall keys) still parse, as unset") {
    val root = Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors, root, "legacy", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    // overwrite with the r13-format manifest (no assign_probes /
    // super_probes / measured_recall keys) — shipped artifacts built
    // before the dial fields must keep loading
    val legacyJson =
      """{"dim": 8, "count": 100, "model": "none", "normalize": false,
        | "backend": "ivf",
        | "params": {"nlist": 4, "nprobe": 2},
        | "chunking": {"mode": "fixed", "size": 100, "overlap": 20},
        | "metric": "ip", "created_at": "2026-01-01T00:00:00"}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/legacy/latest/manifest.json"),
      legacyJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the nio write bypassed Hadoop's LocalFileSystem, whose stale .crc
    // sidecar from the build would fail the checksummed read-back
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/legacy/latest/.manifest.json.crc"))
    val m = IndexStore.manifest(root, "legacy")
    assert(m.params.nlist == 4 && m.params.nprobe == 2)
    assert(m.params.assignProbes == -1 && m.params.superProbes == -1)
    assert(m.measuredRecall == -1.0)
    assert(m.servingProbes == 2)
    // pre-r14 manifests also lack the HNSW parity knobs -> schema defaults
    assert(m.params.m == 16 && m.params.efConstruction == 200 &&
      m.params.efSearch == 64)
  }

  test("sidecar cache: repeat loads are driver-map hits, rebuilds refresh") {
    val root = Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors, root, "sc", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val first = IndexStore.loadCentroids(spark, root, "sc")
    // a serving loop's second load must be the cached ARRAY, not a re-read
    assert(IndexStore.loadCentroids(spark, root, "sc") eq first)
    // a rebuild rewrites the manifest (here the count changes; a
    // same-count rebuild differs in created_at) -> the stale entry can no
    // longer be served; the fresh build's centroids come back
    IndexStore.build(vectors.limit(50), root, "sc", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val second = IndexStore.loadCentroids(spark, root, "sc")
    assert(!(second eq first), "rebuild must refresh the sidecar cache")
  }

  test("loadServing reuses one lazy scan per artifact and sees appends") {
    val root = Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors, root, "lv", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val first = IndexStore.loadServing(spark, root, "lv")
    // repeat serving loads are the SAME frame (file listing resolved once)
    assert(IndexStore.loadServing(spark, root, "lv") eq first)
    assert(first.count() == 100)
    // an append rewrites the manifest -> the next serving load re-lists
    // and the appended rows are visible
    IndexStore.append(vectors.limit(7)
      .withColumn("id", concat(lit("n"), col("id"))), root, "lv")
    val second = IndexStore.loadServing(spark, root, "lv")
    assert(!(second eq first), "append must invalidate the serving frame")
    assert(second.count() == 107)
  }

  test("ivf layout holds one parquet file per cell directory") {
    // partitionBy from W writer tasks would scatter up to W files into
    // every cell directory (W·nlist tiny files at scale); the build
    // repartitions on the partition column so each cell is one file
    val root = Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors.repartition(8), root, "onefile", "ivf",
      params = IndexStore.Params(nlist = 4, nprobe = 2))
    val cellDirs = new java.io.File(s"$root/onefile/latest/vectors")
      .listFiles().filter(_.isDirectory).filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName} holds ${parts.length} files; want exactly 1")
    }
  }

  test("list and delete manage indexes like the reference endpoints") {
    val root = java.nio.file.Files.createTempDirectory("graft-idx").toString
    IndexStore.build(vectors, root, "ix_a", "flat")
    IndexStore.build(vectors, root, "ix_b", "flat")
    assert(IndexStore.list(root) == Seq("ix_a", "ix_b"))
    assert(IndexStore.delete(root, "ix_a"))
    assert(IndexStore.list(root) == Seq("ix_b"))
    assert(!IndexStore.delete(root, "ix_a")) // already gone -> no-op
  }

}
