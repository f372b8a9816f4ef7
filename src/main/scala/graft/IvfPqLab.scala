package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** IVF-PQ tuning harness: for one sf directory, measures (a) recall@5 vs
  * the exact brute-force truth over a BOUNDED deterministic probe sample
  * (hash-ordered cap — the full %100 probe set is quadratic against the
  * corpus at sf10) and (b) wall time of the FULL q_ann_ivfpq query shape
  * (all %100 probes, noop sink, median of `runs`), for each configuration
  * passed on the command line.
  *
  * Usage: IvfPqLab <sfDir> [probeCap] [cfg ...]
  *   cfg = cells:nProbe:refine[:fit]  (cells=0 → ivfPqParamsFor(n) rule)
  * Prints one line per config: name, cells, nProbe, refine, recall,
  * median seconds. A tool, not a query — nothing here feeds Verify. */
object IvfPqLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probeCap = if (args.length > 1) args(1).toInt else 256
    val cfgs = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val v = Tables.load(spark, sfDir, "embeddings")
    val n = v.count()
    val allProbes = v.filter(col("vec_id") % 100 === 0)
    val sampled = allProbes
      .orderBy(xxhash64(col("vec_id").cast("string"))).limit(probeCap)
      .persist()
    val nProbes = sampled.count()
    println(s"[lab] corpus=$n probes(sampled)=$nProbes cellsFor=${Similarity.cellsFor(n)}")

    val truth = Similarity.bruteForceTopK(sampled, v, k = 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    println(s"[lab] truth pairs=${truth.size}")

    cfgs.foreach { cfg =>
      val parts = cfg.split(":")
      val (cells0, np0, rf0) = (parts(0).toInt, parts(1).toInt, parts(2).toInt)
      val fit = parts.length > 3 && parts(3) == "fit"
      // cells=0 → the full ivfPqParamsFor rule, INCLUDING its refine when
      // the cfg's refine field is also 0 (a literal refine=0 is invalid
      // anyway — ivfPqTopK requires refine > 0 — so 0:0:0 means "exactly
      // what the query wiring runs").
      val (cells, np, rf) =
        if (cells0 == 0) {
          val (c, p, r) = Similarity.ivfPqParamsFor(n)
          (c, p, if (rf0 > 0) rf0 else r)
        } else (cells0, np0, rf0)
      val cents: Seq[Seq[Double]] =
        if (fit) Similarity.kmeansFit(v, k = cells, maxIter = 5)
        else Nil
      // Diagnostic: ACTUAL scanned corpus mass = Σ_probe |top-nProbe
      // cells| / (probes × corpus). Nominal coverage is nProbe/cells,
      // but skewed cell populations (sampled centroids) can pull the
      // probed mass far above it — the ADC pair volume follows the MASS.
      locally {
        val vv = v.select(col("vec_id"),
          graft.operators.Similarity.asDouble(col("embedding")).as("cv"))
          .withColumn("cn", graft.functions.DotProductExpr.dotProduct(col("cv"), col("cv")))
          .filter(col("cn") > 0)
        // Same zero/NaN-norm filter ivfPqTopK applies to caller-supplied
        // centroids — without it a degenerate fitted centroid makes this
        // diagnostic's cell model diverge from the one the timed query uses.
        val centRows: Seq[(Seq[Double], Double)] =
          if (fit) cents.map(c => c -> c.map(x => x * x).sum)
            .filter { case (_, cn) => cn > 0 && !cn.isNaN }
          else vv.orderBy(xxhash64(col("vec_id").cast("string"))).limit(cells)
            .select(col("cv"), col("cn")).collect()
            .toSeq.map(r => r.getSeq[Double](0).toSeq -> r.getDouble(1))
        val model = graft.functions.CellModel(centRows)
        val sizes = vv.withColumn("cell",
            graft.functions.CellAssignExpr.cellAssign(col("cv"), col("cn"), model))
          .groupBy("cell").count().as[(Int, Long)].collect().toMap
        val probedMass = sampled
          .select(graft.operators.Similarity.asDouble(col("embedding")).as("qv"))
          .withColumn("qn", graft.functions.DotProductExpr.dotProduct(col("qv"), col("qv")))
          .filter(col("qn") > 0)
          .select(explode(graft.functions.CellTopExpr.cellTop(col("qv"), col("qn"), model, np)).as("cell"))
          .as[Int].collect().map(c => sizes.getOrElse(c, 0L)).sum
        val frac = probedMass.toDouble / (nProbes * n)
        println(f"[lab] cfg=$cfg scanned_mass=$frac%.3f (nominal=${np.toDouble / cells}%.3f)")
      }
      val got = Similarity.ivfPqTopK(sampled, v, k = 5, nCentroids = cells,
          nProbe = np, refine = rf, centroids = cents)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val recall = if (truth.isEmpty) 1.0
        else got.count(truth.contains).toDouble / truth.size
      // full-query timing (all probes), median of 3
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Similarity.ivfPqTopK(allProbes, v, k = 5, nCentroids = cells,
            nProbe = np, refine = rf, centroids = cents)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[lab] cfg=$cfg cells=$cells nProbe=$np refine=$rf fit=$fit " +
        f"recall=$recall%.3f median=${times(1)}%.2fs times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
