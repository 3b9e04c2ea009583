package graft.tools

import graft.core.GraftSession

/** SQL query runner over the corpus + custom functions (the `sqlsurface`
  * module of SURVEY.md §7.1): parse → Catalyst analyze/optimize → execute,
  * print rows.
  *
  * usage: SqlShell <sfDir> <sql> [maxRows]
  */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql = args(1)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val spark = GraftSession.create(appName = "graft-sql")
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.enableSqlSurface(spark, sfDir)
    spark.sql(sql).show(maxRows, truncate = false)
    spark.stop()
  }
}
