package graft.tools

/** Print PrestoSql.rewrite output for statements given on stdin (dev). */
object RewriteProbe {
  def main(args: Array[String]): Unit =
    scala.io.Source.stdin.getLines().filter(_.trim.nonEmpty).foreach { s =>
      println("== " + s)
      println(graft.PrestoSql.rewrite(s))
      println()
    }
}
