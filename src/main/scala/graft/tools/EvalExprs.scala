package graft.tools
import graft._
import scala.io.Source
/** One-off audit tool: evaluate each expression (one per line) via
  * Engine.sql and print TAB-separated index/value. */
object EvalExprs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val e = Engine(spark)
    Source.fromFile(args(0), "UTF-8").getLines().zipWithIndex.foreach { case (expr, i) =>
      val v = try String.valueOf(e.sql(s"SELECT $expr AS v").head.get(0))
        catch { case t: Throwable => "ERROR:" + t.getClass.getSimpleName +
          " " + String.valueOf(t.getMessage).replace('\n', ' ').take(300) }
      println(s"$i\t$v")
    }
  }
}
