package graft.tools
import scala.io.Source

/** Prints RefCorpus.oracleize of each input line (one statement per line),
  * tab-separated as `<i> TAB <oracleized sql>` — the DuckDB half of the
  * corpus harvest pipeline (RefSqlDump is the Spark half). */
object Oracleize {
  def main(args: Array[String]): Unit =
    Source.fromFile(args(0), "UTF-8").getLines().zipWithIndex.foreach {
      case (sql, i) =>
        println(s"$i\t${(if (args.contains("raw")) graft.queries.RefCorpus.oracleizeRaw(sql)
                  else graft.queries.RefCorpus.oracleize(sql)).replace('\n', ' ')}")
    }
}
