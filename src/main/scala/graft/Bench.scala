package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Median of the timed samples — robust to a single GC pause / JIT blip
    * in a way neither mean nor min is (min hides a genuinely bimodal
    * query; mean lets one outlier dominate). Even count → mean of the two
    * middle samples. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Driver contract: bench runs at local[32]. (Round-1 defaulted to 4 —
    // the driver doesn't set SPARK_GRAFT_CPUS, so BENCH_r01's 207.9s was
    // a quarter-width run.)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Timed samples per query (median reported). BENCH_r02 showed 3-9x
    // cross-JVM noise on single-sample timings: one warmup of only the
    // FIRST query let a cold/contended JVM inflate whichever queries ran
    // early. Now EVERY query gets one untimed warmup (absorbs codegen +
    // page-cache first-run cost, measured at 4-6s) and the reported number
    // is the median of `runs` steady-state executions.
    // max(1): a zero/negative override would crash median() on an empty
    // sample AFTER burning the warmup sweep.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset filter for targeted perf iteration,
    // and an exclusion list (SPARK_GRAFT_SKIP) for large-sf runs: a few
    // queries are QUADRATIC-BY-CONTRACT verify-scale baselines (exact
    // brute-force/all-pairs truths whose scale-path twins are in the
    // suite); excluded names are recorded in the JSON's "skipped" field
    // so a selective bench is visible in the artifact, never silent.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) && !skip.contains(n) }

    // noop sink: fully materializes every output column (count() lets
    // Catalyst prune unreferenced projections, faking scan-heavy timings)
    // without any write-path cost. clearCache after every execution:
    // dedup/similarity queries persist intermediates, and accumulated
    // cache pinning skewed later queries by up to 10x on earlier runs —
    // it also means every timed sample rebuilds its own intermediates
    // rather than reading a predecessor's cache.
    // Returns None on failure: a failed query's near-zero time-to-throw
    // must NOT enter the median — a broken build would bench FASTER than
    // a working one, with exit 0 and no marker in the parsed output.
    def execute(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(dt) else None
    }

    // INTERLEAVED passes: one untimed warmup pass over every query, then
    // `runs` full timed passes, median per query ACROSS passes. The r2/r3
    // driver runs showed contention arriving in sustained multi-minute
    // bursts: with per-query back-to-back samples, a burst inflates all
    // of one query's samples (the median keeps the inflation); with
    // pass-interleaved samples, a burst inflates one PASS and the
    // cross-pass median rejects it. Same total work either way.
    // Deterministic pass order, with q_dedup_ngram_jaccard hoisted ahead
    // of its family (canonical/clusters/containment/pagerank): the five
    // queries share one materialized pair table (operators/
    // NearDupPipeline) that the FIRST family query of a pass builds, so
    // ordering pins the build cost on the pairs query itself — the
    // artifact then reads "pairs = build + filter; the rest = their
    // post-pair cost", which is the pipeline-user reality being
    // benchmarked. Map iteration order would attribute it arbitrarily.
    // Same attribution rule for the span family: the strike is the
    // census table's natural builder (the table IS its per-doc
    // duplicated-starts intermediate), so it runs first and carries the
    // build; the census report then reads counts off the artifact.
    val order = selected.toSeq.sortBy { case (n, _) =>
      if (n == "q_dedup_ngram_jaccard") "q_dedup_"
      else if (n == "q_span_strike") "q_span_" else n }
    // The pair-table memo is invalidated at every PASS boundary (not per
    // query): within a pass the family reuses the one materialized table
    // (the thing this design exists to measure), across passes each
    // timed sample of the builder rebuilds it — otherwise run 2+ of the
    // build query would memo-hit and report filter-only times.
    def pass(): Map[String, Option[Double]] = {
      graft.operators.NearDupPipeline.invalidateAll(spark)
      graft.operators.SpanPipeline.invalidateAll(spark)
      order.map { case (name, fn) => name -> execute(name, fn) }.toMap
    }
    pass() // warmup
    val passes = (1 to runs).map(_ => pass())
    val results = order.map { case (name, _) =>
      val samples = passes.flatMap(_(name))
      if (samples.length == runs) {
        val med = median(samples)
        System.err.println(f"[bench] $name%-28s median=$med%7.2fs samples=${samples.map(s => f"$s%.2f").mkString(",")}")
        name -> Some(med)
      } else name -> None
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }.toSeq.sorted
    // Same escaping contract as Verify's oracle_sql.json writer: an
    // unescaped quote/backslash in sfDir would invalidate the JSON line
    // and zero the round's bench result at the driver's parse.
    def j(s: String): String = JsonUtil.esc(s)
    val qs = ok.map { case (k, v) => s"\"${j(k)}\":" + v }.mkString("{", ",", "}")
    val errs =
      if (failed.isEmpty) ""
      else s""","errors":${failed.map(f => "\"" + j(f) + "\"").mkString("[", ",", "]")}"""
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val skipped =
      if (skip.isEmpty) ""
      else s""","skipped":${skip.toSeq.sorted.map(s => "\"" + j(s) + "\"").mkString("[", ",", "]")}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errs$skipped,"sf":"${j(sfDir)}"}"""
    println(json)
    // ALSO write the full JSON to a file: the driver captures stdout with
    // a bounded tail, and BENCH_r04's embedded result was truncated
    // mid-JSON (only 63/78 per-query times survived in the artifact). The
    // file is the machine-readable record; stdout stays the contract.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full JSON written to $outPath")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
    // No nonzero exit: the JSON line above is the contract and has
    // already been emitted with the explicit "errors" marker.
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
  }
}
