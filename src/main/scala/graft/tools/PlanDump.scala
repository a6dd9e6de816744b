package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization-round plan artifact (plans/r<N>/<query>_<tag>.txt).
  * Uses the same session confs as Bench so the captured plan is the plan
  * the bench actually runs.
  *
  * args: sfDir outDir tag query1,query2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.split(',').foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // AQE finalizes join strategy / exchange coalescing at runtime —
        // record the executed plan too so claims about the FINAL shape
        // (ReusedExchange, AQEShuffleRead, broadcast conversions) are
        // checkable against what actually ran
        df.collect()
        val fin = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"),
          s"== explain(formatted) ==\n$formatted\n\n== executed (AQE-final) ==\n$fin\n")
        println(s"[plandump] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
