package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Driver contract: bench runs at local[32]. (Round-1 defaulted to 4 —
    // the driver doesn't set SPARK_GRAFT_CPUS, so BENCH_r01's 207.9s was
    // a quarter-width run.)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset filter for targeted perf iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // One untimed warmup run of the first query absorbs JVM/codegen/page-
    // cache first-run costs (measured at 4-6s on whichever query goes
    // first) so the per-query timings reflect steady state.
    selected.headOption.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: fully materializes every output column (count() lets
      // Catalyst prune unreferenced projections, faking scan-heavy timings)
      // without any write-path cost.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // Dedup/similarity queries persist intermediate tables (postings,
      // signatures); drop them so later queries aren't timed under
      // accumulated cache/GC pressure from earlier ones.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
