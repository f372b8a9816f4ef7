package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan auditor: prints per-query physical-plan health — shuffle count,
  * broadcast usage, whole-stage-codegen coverage, parquet pushdown — so
  * plan regressions are visible without reading full explains.
  * Usage: runMain graft.ExplainAudit [sfDir] [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      def n(pat: String) = pat.r.findAllIn(plan).length
      val exchanges = n("Exchange ") - n("Exchange SinglePartition")
      val summary = Seq(
        s"shuffles=$exchanges",
        s"singlePart=${n("Exchange SinglePartition")}",
        s"broadcasts=${n("BroadcastExchange")}",
        s"codegenNodes=${n("\\[codegen id : ")}",
        s"scans=${n("Scan parquet")}",
        s"pushedFilters=${n("PushedFilters: \\[[^\\]]")}",
        // Anti-pattern flags: a global ordered limit funnels every
        // partition's top-K through one task; a cartesian product that
        // isn't a broadcast NLJ is a scale bug.
        s"takeOrdered=${n("TakeOrderedAndProject")}",
        s"cartesian=${n("CartesianProduct")}"
      ).mkString(" ")
      println(f"$name%-26s $summary")
      if (sys.env.contains("SPARK_GRAFT_FULL_PLAN")) println(plan)
    }
    spark.stop()
  }
}
