package graft.tools

import graft._

/** Scratch probe main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import org.apache.spark.sql.catalyst.expressions._
    // what does Spark's own `try_divide`-style integral divide look like?
    println(spark.sql("SELECT try_divide(1L, 0L) AS a").queryExecution.analyzed.treeString)
    println(spark.sql("SELECT 1L div 0L AS a").queryExecution.analyzed.treeString)
    // direct eval of IntegralDivide under TRY ctx
    val tryCtx = spark.sql("SELECT try_divide(1, 0) AS a").queryExecution.analyzed
      .expressions.flatMap(_.collect { case d: Divide => d.evalContext }).head
    val idiv = IntegralDivide(Literal(1L), Literal(0L), tryCtx)
    println("ctx=" + tryCtx)
    try println("eval=" + idiv.eval(null))
    catch { case t: Throwable => println("THREW " + t.getClass.getSimpleName) }
  }
}
