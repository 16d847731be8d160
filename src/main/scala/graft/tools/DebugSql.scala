package graft.tools
import graft._
/** Full-stack-trace variant of RefSql for triaging a single statement. */
object DebugSql {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val e = graft.queries.RefCorpus.engine(spark, dir)
    try {
      val rows = e.sql(args(0)).collect()
      println(s"OK rows=${rows.length} head=${rows.headOption.getOrElse("")}")
    } catch { case t: Throwable =>
      val sw = new java.io.StringWriter
      t.printStackTrace(new java.io.PrintWriter(sw))
      println(sw.toString)
    }
  }
}
