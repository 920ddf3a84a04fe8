package graft

import java.nio.file.{Files, Paths}

/** Regenerates QUERIES.md from SparkEntry.defs — run after adding or
  * changing a graded query:
  * `sbt "Test/runMain graft.QueriesDocMain"`.
  */
object QueriesDocMain {
  def main(args: Array[String]): Unit = {
    val defs = SparkEntry.defs.sortBy(_.name)
    val rows = defs.map { d =>
      val oracle = if (d.oracle.isDefined) "DuckDB hash-match" else "rows-only"
      val headline = if (d.headline) "yes" else ""
      s"| ${d.name} | $oracle | $headline |"
    }
    // NOTE: no stripMargin over the interpolated rows — it would strip
    // each row's leading markdown pipe and malform the table
    val doc =
      "# QUERIES — the graded registry (generated from SparkEntry.defs)\n\n" +
        "| name | oracle | headline |\n|---|---|---|\n" +
        rows.mkString("\n") + "\n\n" +
        s"${defs.size} queries, ${defs.count(_.oracle.isDefined)} " +
        s"oracle-checked, ${defs.count(_.headline)} benchmarked.\n"
    Files.writeString(Paths.get("QUERIES.md"), doc)
    println(s"QUERIES.md: ${defs.size} queries, " +
      s"${defs.count(_.oracle.isDefined)} oracle-checked")
  }
}
