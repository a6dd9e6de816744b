package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch SQL job runner (C14; reference: lakesoul/entry/SqlSubmitter.scala:
  * 7-64): runs a ;-separated SQL script with `${scheduleTime}` (and any
  * KEY=VALUE args) substituted.
  *
  *   runMain graft.tools.SqlSubmitter <script.sql> [scheduleTime=... k=v ...]
  */
object SqlSubmitter {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SqlSubmitter <script.sql> [k=v ...]")
    val script = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val vars = args.drop(1).map { a =>
      val i = a.indexOf('='); a.substring(0, i) -> a.substring(i + 1)
    }.toMap
    val spark = SparkSession.builder()
      .appName("graft-sql-submit")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    val substituted = vars.foldLeft(script) { case (s, (k, v)) =>
      s.replace("${" + k + "}", v)
    }
    substituted.split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
      spark.sql(stmt).show(20, truncate = false)
    }
    spark.stop()
  }
}
