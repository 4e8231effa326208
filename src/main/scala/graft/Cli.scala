package graft

import graft.catalog.Lake
import graft.operators.CatalogOps
import graft.plans.GraftExtensions

/** Command-line surface — the datalake_cli.py analog
  * (reference: scripts/datalake_cli.py: status / info / query).
  *
  * Usage:
  *   graft.Cli status <tableDir>
  *   graft.Cli info <tableDir>
  *   graft.Cli search <tableDir> <pattern>
  *   graft.Cli query <tableDir> "<SQL over the registered views>"
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        """usage: graft.Cli status <tableDir>
          |       graft.Cli info <tableDir>
          |       graft.Cli search <tableDir> <pattern>
          |       graft.Cli query <tableDir> "<sql>"""".stripMargin
      )
      sys.exit(2)
    }
    val cmd = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val lake = Lake(spark, dir)
    cmd match {
      case "status" =>
        CatalogOps.cat01Status(lake).show(100, truncate = false)
      case "info" =>
        println(CatalogOps.infoJson(lake))
      case "search" =>
        if (args.length < 3) {
          System.err.println("usage: graft.Cli search <tableDir> <pattern>")
          sys.exit(2)
        }
        CatalogOps.searchCatalog(lake, args(2)).show(200, truncate = false)
      case "query" =>
        lake.registerViews()
        spark.sql(args(2)).show(100, truncate = false)
      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
