package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew diagnostics for a testdata dir (the GenScale `--skew` sweep's
  * companion): measures the adversarial shapes present in the data and how
  * often each scale guard actually fires on them — the evidence that the
  * stop-bucket / hot-cell designs are exercised under the bench harness,
  * not just by synthetic unit specs.
  *
  * Prints ONE JSON line:
  * - events: total rows + share owned by the hottest user (hot-key shape);
  * - documents: largest verbatim-duplicate group (normGroups collapse
  *   load) and the distinct-content count of the near-dup family;
  * - minhash: surviving vs SATURATED (band, key) buckets over distinct
  *   contents — saturated buckets are exactly the ones the fused
  *   BoundedSortedCollect cap drops in dedup_minhash/verified;
  * - ivf: hot cells dropped by the integer-exact MaxCellFactor rule and
  *   the share of multi-probe assignments they carried (ann_ivf's guard);
  * - emb_lsh: sign-LSH buckets over the cap that dedup_embedding_lsh drops.
  *
  * With a second dir, also reports `ivf_stale`: the skewed embeddings
  * assigned under centroids FIT ON THAT OTHER (uniform) corpus — the
  * frozen-quantizer shape of IndexStore.append, where a drifted corpus
  * meets yesterday's fit. A fresh Lloyd fit ADAPTS to a 20% point-mass
  * (it splits the cluster across several centroids, so no cell trips the
  * cap — that is the fit doing its job); the cap is the backstop for
  * exactly the stale case, where the whole hot cluster lands in ONE
  * pre-existing cell and must be dropped + flagged for refit.
  *
  * Usage: `runMain graft.SkewReport <sfDir> [staleCentroidDir]`
  */
object SkewReport {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val staleDir = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events: hottest-user share
    val evCounts = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("total"), max(col("n")).as("hot")).head()
    val evTotal = evCounts.getLong(0)
    val evHotShare = evCounts.getLong(1).toDouble / evTotal

    // documents: verbatim-group sizes over the SAME normalization the
    // dedup family collapses on
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val docGroups = Tables.documents(spark, dir)
      .select(norm.as("norm"))
      .groupBy(col("norm")).agg(count(lit(1)).as("g"))
      .localCheckpoint(true)
    val topGroup = docGroups.agg(max(col("g"))).head().getLong(0)
    val nDistinct = docGroups.count()

    // minhash band buckets over distinct contents: the stop-bucket guard's
    // exact firing condition (bucket membership > MaxBucketSize distinct
    // contents)
    val mhBuckets = docGroups
      .select(posexplode(graft.functions.MinHashConf.column(col("norm")))
        .as(Seq("band", "key")))
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val mhTotal = mhBuckets.count()
    val mhSat = mhBuckets.filter(col("n") > graft.operators.Dedup.MaxBucketSize).count()
    val mhMax = mhBuckets.agg(max(col("n"))).head().getLong(0)

    // IVF multi-probe assignment: hot cells by the integer-exact rule
    val cents = graft.operators.IvfModel.centroids(spark, dir)
    val multi = Tables.embeddings(spark, dir)
      .select(explode(graft.functions.IvfProbes.column(
        col("embedding"), cents, graft.operators.VectorOps.AssignProbes)).as("p"))
      .select(col("p.cell").as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val asgTotal = multi.agg(sum(col("n"))).head().getLong(0)
    val hotCells = multi.filter(
      col("n") * cents.length >
        lit(graft.operators.VectorOps.MaxCellFactor.toLong * asgTotal))
    val nHotCells = hotCells.count()
    val hotAsgShare = (if (nHotCells == 0) 0.0
      else hotCells.agg(sum(col("n"))).head().getLong(0).toDouble / asgTotal)

    // stale-quantizer assignment: this dir's vectors under the OTHER
    // dir's centroids (the frozen-quantizer append path)
    val stale = staleDir.map { sd =>
      val sc = graft.operators.IvfModel.centroids(spark, sd)
      val sm = Tables.embeddings(spark, dir)
        .select(explode(graft.functions.IvfProbes.column(
          col("embedding"), sc, graft.operators.VectorOps.AssignProbes)).as("p"))
        .select(col("p.cell").as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val sTotal = sm.agg(sum(col("n"))).head().getLong(0)
      val sHot = sm.filter(
        col("n") * sc.length >
          lit(graft.operators.VectorOps.MaxCellFactor.toLong * sTotal))
      val nSHot = sHot.count()
      val sShare = (if (nSHot == 0) 0.0
        else sHot.agg(sum(col("n"))).head().getLong(0).toDouble / sTotal)
      (sc.length, nSHot, sShare)
    }

    // embedding sign-LSH buckets over the cap
    val dim = graft.operators.Dedup.embeddingDim(spark, dir)
    val planes = Array.tabulate(graft.operators.Dedup.EmbLshBits, dim)(
      (k, j) => graft.operators.Dedup.hyperplane(k, j))
    val lshBuckets = Tables.embeddings(spark, dir)
      .select(posexplode(graft.functions.VecSignChunks.column(
        col("embedding"), planes, graft.operators.Dedup.EmbLshChunkBits))
        .as(Seq("chunk", "key")))
      .groupBy(col("chunk"), col("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val lshTotal = lshBuckets.count()
    val lshSat = lshBuckets.filter(col("n") > graft.operators.Dedup.MaxBucketSize).count()

    println(
      f"""{"sf":"$dir","events":{"n":$evTotal,"hot_user_share":$evHotShare%.4f},""" +
      f""""documents":{"n_distinct_contents":$nDistinct,"top_verbatim_group":$topGroup},""" +
      f""""minhash":{"n_buckets":$mhTotal,"n_saturated":$mhSat,"max_bucket":$mhMax},""" +
      f""""ivf":{"n_cells":${cents.length},"n_hot_cells":$nHotCells,"hot_assignment_share":$hotAsgShare%.4f},""" +
      stale.map { case (k, nh, sh) =>
        f""""ivf_stale":{"n_cells":$k,"n_hot_cells":$nh,"hot_assignment_share":$sh%.4f},""" }
        .getOrElse("") +
      f""""emb_lsh":{"n_buckets":$lshTotal,"n_saturated":$lshSat}}""")
    spark.stop()
  }
}
