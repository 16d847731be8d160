package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted semantic assertions (the per-operator analogue of the
  * reference's MAINT/operator tests — hand-checkable invariants on tiny
  * data rather than oracle hashes). */
class OperatorSemanticsSpec extends AnyFunSuite {
  import TestSession._

  test("q26 cross join emits |nation| x |region| rows") {
    val rows = SparkEntry.all("q26_join_cross").fn(spark, sf).collect()
    assert(rows.length == 25)           // 25 nations
    assert(rows.forall(_.getLong(1) == 5)) // 5 regions each
  }

  test("q51 values roundtrip") {
    val rows = SparkEntry.all("q51_values").fn(spark, sf).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "a", 2), (2, "b", 4), (3, "c", 6)))
  }

  test("topk per partition never exceeds k") {
    val df = SparkEntry.all("q34_win_topk").fn(spark, sf)
    val maxPer = df.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPer <= 3)
  }

  test("sessionize: events within one session are gap-bounded") {
    val df = SparkEntry.all("e03_sessionize").fn(spark, sf)
    // session count per user >= 1 and durations non-negative
    assert(df.filter(col("duration_s") < 0).count() == 0)
    assert(df.groupBy("user_id").count().filter(col("count") < 1).count() == 0)
  }

  test("minhash signatures are deterministic") {
    val a = SparkEntry.all("d03_minhash_sig").fn(spark, sf).collect()
    val b = SparkEntry.all("d03_minhash_sig").fn(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("exact dedup: n_unique + n_dropped == n_total") {
    val r = SparkEntry.all("d01_dedup_exact").fn(spark, sf).head
    assert(r.getLong(0) + r.getLong(2) == r.getLong(1))
  }

  test("jaccard is in [0,1] and symmetric by construction") {
    val df = SparkEntry.all("d06_ngram_jaccard").fn(spark, sf)
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("cosine similarity of a vector with itself is 1") {
    val e = Tables.t(spark, sf, "embeddings").limit(5)
      .select(operators.Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(e.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("brute-force cosine topk is ordered descending") {
    val sims = SparkEntry.all("s01_cosine_topk").fn(spark, sf)
      .select("cos_sim").collect().map(_.getDouble(0))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("lsh ann returns a subset of corpus with matching bucket") {
    val df = SparkEntry.all("s03_ann_lsh").fn(spark, sf)
    val buckets = df.select("bucket").distinct().collect()
    assert(buckets.length <= 1) // all candidates share the query's bucket
  }

  test("lang_id covers all documents exactly once") {
    val total = SparkEntry.all("t01_lang_id").fn(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(total == Tables.t(spark, sf, "documents").count())
  }

  test("rollup has grand total row equal to table count") {
    val df = SparkEntry.all("q46_rollup").fn(spark, sf)
    val grand = df.filter(col("g_rf") === 1 && col("g_ls") === 1)
      .select("n").head.getLong(0)
    assert(grand == Tables.t(spark, sf, "lineitem").count())
  }

  test("bare ROLLUP/CUBE on EMPTY input emits the one global row (Presto QueryPlanner)") {
    val e = Engine(spark)
    val base = "(VALUES (1, 'a'), (2, 'a'), (3, 'b')) v(x, y)"
    // empty input: the () grouping set is a global aggregation — one row
    val empty = e.sql("SELECT count(*) AS n, sum(x) AS s FROM " +
      s"(SELECT * FROM $base WHERE 1=0) t GROUP BY ROLLUP(y)").collect()
    assert(empty.length == 1 && empty(0).getLong(0) == 0L && empty(0).isNullAt(1))
    val emptyCube = e.sql(s"SELECT y, count(*) AS n FROM $base " +
      "WHERE x < 0 GROUP BY CUBE(x, y)").collect()
    assert(emptyCube.length == 1 && emptyCube(0).isNullAt(0) &&
      emptyCube(0).getLong(1) == 0L)
    // non-empty input: exactly ONE global row (the guarded branch stays out)
    val rows = e.sql(s"SELECT y, count(*) AS n FROM $base GROUP BY ROLLUP(y)")
      .collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.length == 3) // 'a', 'b', and the global row
    assert(rows.filter(_.isNullAt(0)).head.getLong(1) == 3L)
    // HAVING applies to the guarded branch too
    val having = e.sql(s"SELECT y, count(*) AS n FROM $base " +
      "GROUP BY ROLLUP(y) HAVING count(*) > 100").collect()
    assert(having.isEmpty)
  }

  test("full outer join keeps keys from both sides") {
    val df = SparkEntry.all("q27_join_full").fn(spark, sf)
    assert(df.filter(col("n_hi") === 0 && col("n_lo") === 0).count() == 0)
  }
}
