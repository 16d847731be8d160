package graft.tools

import graft._

/** Scratch probe main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val e = graft.queries.RefCorpus.engine(spark, "/root/testdata/sf0.001")
    val cases = Seq(
      "SELECT array_agg(v ORDER BY v) FROM (VALUES (3), (1), (2)) t(v)",
      "SELECT array_agg(v ORDER BY v DESC) FROM (VALUES (3), (1), (2)) t(v)",
      "SELECT array_agg(v ORDER BY k DESC, v) FROM (VALUES (1, 'b'), (2, 'a'), (3, 'b')) t(v, k)",
      "SELECT array_agg(v ORDER BY k NULLS FIRST) FROM (VALUES (1, 2), (2, CAST(NULL AS INT)), (3, 1)) t(v, k)",
      "SELECT array_agg(v ORDER BY k) FROM (VALUES (1, 2), (2, CAST(NULL AS INT)), (3, 1)) t(v, k)",
      "SELECT array_agg(DISTINCT v ORDER BY v) FROM (VALUES (3), (1), (3), (2)) t(v)",
      "SELECT array_agg(v ORDER BY v) FILTER (WHERE v > 1) FROM (VALUES (3), (1), (2)) t(v)",
      "SELECT array_agg(v ORDER BY v) FILTER (WHERE v > 9) FROM (VALUES (3), (1), (2)) t(v)",
      // the verbatim AbstractTestAggregations.java:1190 statement
      "SELECT orderpriority, custkey, array_agg(orderstatus ORDER BY orderstatus) FILTER (WHERE custkey > 500)" +
        "FROM orders WHERE orderkey IN (1, 2, 3, 4, 5) " +
        "GROUP BY GROUPING SETS ((), (orderpriority), (orderpriority, custkey))"
    )
    cases.foreach { q =>
      val out = try {
        val rows = e.sql(q).collect()
        rows.map(_.toString).mkString("; ")
      } catch { case t: Throwable =>
        "ERROR " + t.getClass.getSimpleName + ": " +
          String.valueOf(t.getMessage).replace('\n', ' ').take(250) }
      println(s"$q\n  => $out\n")
    }
  }
}
