package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for q_ann_lsh's scale rule (the IvfPqLab
  * pattern): exact truth over a bounded hash-ordered probe sample, then
  * recall + wall + candidate volume for a grid of (bands, planesPerBand,
  * nProbe, label) configs — the evidence basis for the wiring's
  * planes/probe formula at corpus scales where the full VerifyExtras
  * check set is quadratic-by-contract.
  *
  * `LshLab <sfDir> [probeCap=256] [outFile=LSH_LAB.json]`. */
object LshLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val probeCap = if (args.length > 1) args(1).toInt else 256
    val out = if (args.length > 2) args(2) else "LSH_LAB.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings").persist(lvl)
    val n = emb.count()
    val sampled = emb.filter(col("vec_id") % 100 === 0)
      .orderBy(xxhash64(col("vec_id").cast("string"))).limit(probeCap)
      .persist(lvl)
    sampled.count()
    val truth = Similarity.bruteForceTopK(sampled, emb, k = 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
    val truthSet = truth.toSet

    // The SHIPPED config always runs as the first row, derived from the
    // same lshParamsFor rule the query wiring uses — the lab table is
    // only trustworthy as a tuning basis if the wired point is in it.
    val (wb, wp, wnp) = Similarity.lshParamsFor(n)
    val wiredPlanes = math.max(4, Similarity.planesFor(n, targetBucket = 512))
    val configs: Seq[(String, Int, Int, Int)] = Seq(
      ("wired", wb, wp, wnp),
      ("r13_4band_cap", 4, math.min(7, wiredPlanes), math.min(math.min(7, wiredPlanes) + 1, 8)),
      ("r12_uncapped", 4, wiredPlanes, math.min(wiredPlanes + 1, 8)),
      ("full1bit_512", 4, wiredPlanes, wiredPlanes + 1),
      ("t2048_full1bit", 4, math.max(4, Similarity.planesFor(n, 2048)),
        math.max(4, Similarity.planesFor(n, 2048)) + 1),
      ("t2048_6bands", 6, math.max(4, Similarity.planesFor(n, 2048)),
        math.max(4, Similarity.planesFor(n, 2048)) + 1),
      ("t4096_full1bit", 4, math.max(4, Similarity.planesFor(n, 4096)),
        math.max(4, Similarity.planesFor(n, 4096)) + 1)
    ).distinct

    val rows = configs.map { case (label, bands, planes, nProbe) =>
      val t0 = System.nanoTime()
      val cand = Similarity.lshTopK(sampled, emb, k = 5, bands = bands,
          planesPerBand = planes, nProbe = nProbe)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val recall =
        if (truth.isEmpty) 1.0
        else cand.count(truthSet.contains).toDouble / truth.length
      System.err.println(f"[lshlab] $label%-16s bands=$bands planes=$planes " +
        f"nProbe=$nProbe recall=$recall%.4f wall=$dt%.1fs rows=${cand.length}")
      s"""{"label":"$label","bands":$bands,"planes":$planes,"nProbe":$nProbe,""" +
        s""""recall":$recall,"wall_sec":$dt,"result_rows":${cand.length}}"""
    }
    val json = s"""{"sf":"${JsonUtil.esc(sfDir)}","n_vectors":$n,""" +
      s""""probe_cap":$probeCap,"truth_pairs":${truth.length},""" +
      s""""configs":[${rows.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    System.err.println(s"[lshlab] written to $out")
    sampled.unpersist(); emb.unpersist()
    spark.stop()
  }
}
