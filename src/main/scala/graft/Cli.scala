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

  /** Read-only gate for the `query` passthrough — the app.py:204-219
    * `validate_query` analog: exactly ONE statement, and it must be a
    * SELECT or WITH. Anything else (DDL, DML, SET, multi-statement
    * input) is rejected before spark.sql ever sees it; an exposed SQL
    * endpoint over a lake must not be able to mutate the session or
    * the catalog. Returns the cleaned statement or the refusal. */
  private[graft] def validateReadOnly(sql: String): Either[String, String] = {
    // Leading comments are legal prefix noise; strip them only for
    // keyword detection (the executed text is the original statement).
    @annotation.tailrec
    def skipComments(s: String): String = {
      val t = s.trim
      if (t.startsWith("--")) skipComments(t.dropWhile(_ != '\n'))
      else if (t.startsWith("/*")) {
        val end = t.indexOf("*/")
        if (end < 0) "" else skipComments(t.drop(end + 2))
      } else t
    }
    val trimmed = sql.trim
    val body = if (trimmed.endsWith(";")) trimmed.dropRight(1).trim else trimmed
    val head = skipComments(body)
    if (head.isEmpty) Left("empty query")
    else if (body.contains(";"))
      Left("multiple statements are not allowed")
    else {
      // `(SELECT …)` is a legal read-only form — skip leading parens.
      val first = head
        .dropWhile(c => c == '(' || c.isWhitespace)
        .split("[\\s(]+", 2)
        .head
        .toUpperCase(java.util.Locale.ROOT)
      if (first == "SELECT" || first == "WITH") Right(body)
      else Left(s"only SELECT/WITH queries are allowed (got $first)")
    }
  }

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
        validateReadOnly(args(2)) match {
          case Left(err) =>
            System.err.println(s"rejected: $err")
            spark.stop()
            sys.exit(3)
          case Right(sqlText) =>
            lake.registerViews()
            spark.sql(sqlText).show(100, truncate = false)
        }
      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
