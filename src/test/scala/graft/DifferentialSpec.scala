package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Differential testing: the same randomly-generated query built through
  * the DataFrame API and through a SQL string must agree exactly. Two
  * independent construction paths through the analyzer catch compat-layer
  * and plan-shape bugs the fixed query corpus misses (the query-diff idea
  * of the reference's H2QueryRunner, turned inward). */
class DifferentialSpec extends AnyFunSuite {
  import TestSession._

  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val keyCols = Seq("l_returnflag", "l_linestatus", "l_shipmode_absent")

  private case class RandQuery(
      groupCol: String, aggCol: String, aggFn: String,
      filterCol: String, filterLo: Double, filterHi: Double)

  private val genQuery: Gen[RandQuery] = for {
    g <- Gen.oneOf("l_returnflag", "l_linestatus")
    a <- Gen.oneOf(numCols)
    f <- Gen.oneOf("sum", "min", "max", "avg", "count")
    fc <- Gen.oneOf(numCols)
    lo <- Gen.chooseNum(0.0, 30.0)
    hi <- Gen.chooseNum(30.0, 100000.0)
  } yield RandQuery(g, a, f, fc, lo, hi)

  private def viaApi(q: RandQuery): DataFrame = {
    val li = Tables.t(spark, sf, "lineitem")
      .filter(col(q.filterCol) >= q.filterLo && col(q.filterCol) <= q.filterHi)
    val agg = q.aggFn match {
      case "sum" => sum(col(q.aggCol).cast("decimal(18,2)")).cast("decimal(38,2)")
      case "min" => min(col(q.aggCol))
      case "max" => max(col(q.aggCol))
      case "avg" => round(avg(col(q.aggCol)), 6)
      case "count" => count(col(q.aggCol)).cast("long")
    }
    li.groupBy(q.groupCol).agg(agg.as("v")).orderBy(q.groupCol)
  }

  private def viaSql(q: RandQuery): DataFrame = {
    Tables.registerAll(spark, sf)
    val aggSql = q.aggFn match {
      case "sum" => s"CAST(sum(CAST(${q.aggCol} AS DECIMAL(18,2))) AS DECIMAL(38,2))"
      case "avg" => s"round(avg(${q.aggCol}), 6)"
      case "count" => s"CAST(count(${q.aggCol}) AS BIGINT)"
      case f => s"$f(${q.aggCol})"
    }
    spark.sql(s"""
      SELECT ${q.groupCol}, $aggSql AS v
      FROM lineitem
      WHERE ${q.filterCol} >= ${q.filterLo} AND ${q.filterCol} <= ${q.filterHi}
      GROUP BY ${q.groupCol} ORDER BY ${q.groupCol}""")
  }

  test("random join+filter+agg queries agree across API and SQL paths") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    val genJoin = for {
      jt <- Gen.oneOf("inner", "left_semi")
      g <- Gen.oneOf("o_orderstatus", "o_orderpriority")
      lo <- Gen.chooseNum(0.0, 40.0)
    } yield (jt, g, lo)
    (1 to 12).foreach { i =>
      val (jt, g, lo) = genJoin(params, seed).get
      seed = seed.next
      val li = Tables.t(spark, sf, "lineitem").filter(col("l_quantity") >= lo)
      val o = Tables.t(spark, sf, "orders")
      val api = (jt match {
        case "inner" => o.join(li, col("o_orderkey") === col("l_orderkey"))
        case _ => o.join(li, col("o_orderkey") === col("l_orderkey"), jt)
      }).groupBy(g).agg(count(lit(1)).as("n")).orderBy(g)
        .collect().map(_.toString).toSeq
      Tables.registerAll(spark, sf)
      val sqlJoin = jt match {
        case "inner" => "JOIN lineitem ON o_orderkey = l_orderkey"
        case _ => "LEFT SEMI JOIN lineitem ON o_orderkey = l_orderkey"
      }
      val sql = spark.sql(s"""
        SELECT $g, count(*) AS n
        FROM orders $sqlJoin AND l_quantity >= $lo
        GROUP BY $g ORDER BY $g""").collect().map(_.toString).toSeq
      assert(api == sql, s"case $i: ($jt, $g, $lo)")
    }
  }

  test("random window top-k queries agree across API and SQL paths") {
    import org.apache.spark.sql.expressions.Window
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(11L)
    val gen = for {
      fn <- Gen.oneOf("row_number", "rank", "dense_rank")
      part <- Gen.oneOf("l_returnflag", "l_linestatus")
      ord <- Gen.oneOf("l_extendedprice", "l_quantity", "l_orderkey")
      k <- Gen.chooseNum(1, 5)
    } yield (fn, part, ord, k)
    (1 to 12).foreach { i =>
      val (fn, part, ord, k) = gen(params, seed).get
      seed = seed.next
      // unique (orderkey, linenumber) tie-break keeps ranks deterministic
      val w = Window.partitionBy(part)
        .orderBy(col(ord), col("l_orderkey"), col("l_linenumber"))
      val f = fn match {
        case "row_number" => row_number()
        case "rank" => rank()
        case _ => dense_rank()
      }
      val api = Tables.t(spark, sf, "lineitem")
        .withColumn("rn", f.over(w)).filter(col("rn") <= k)
        .groupBy(part).agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).cast("long").as("s"))
        .orderBy(part).collect().map(_.toString).toSeq
      Tables.registerAll(spark, sf)
      val sql = spark.sql(s"""
        SELECT $part, count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS s
        FROM (SELECT *, $fn() OVER (PARTITION BY $part
          ORDER BY $ord, l_orderkey, l_linenumber) AS rn FROM lineitem)
        WHERE rn <= $k GROUP BY $part ORDER BY $part""")
        .collect().map(_.toString).toSeq
      assert(api == sql, s"case $i: ($fn, $part, $ord, $k)")
    }
  }

  test("random set-operation queries agree across API and SQL paths") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(23L)
    val gen = for {
      op <- Gen.oneOf("UNION", "UNION ALL", "INTERSECT", "EXCEPT")
      cutA <- Gen.chooseNum(10.0, 40.0)
      cutB <- Gen.chooseNum(10.0, 40.0)
    } yield (op, cutA, cutB)
    (1 to 12).foreach { i =>
      val (op, cutA, cutB) = gen(params, seed).get
      seed = seed.next
      val a = Tables.t(spark, sf, "lineitem")
        .filter(col("l_quantity") <= cutA).select("l_returnflag", "l_linestatus")
      val b = Tables.t(spark, sf, "lineitem")
        .filter(col("l_quantity") <= cutB).select("l_returnflag", "l_linestatus")
      val api = (op match {
        case "UNION" => a.union(b).distinct()
        case "UNION ALL" => a.union(b)
        case "INTERSECT" => a.intersect(b)
        case "EXCEPT" => a.except(b)
      }).groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
      Tables.registerAll(spark, sf)
      val sql = spark.sql(s"""
        SELECT l_returnflag, count(*) AS n FROM (
          SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity <= $cutA
          $op
          SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity <= $cutB)
        GROUP BY l_returnflag ORDER BY l_returnflag""")
        .collect().map(_.toString).toSeq
      assert(api == sql, s"case $i: ($op, $cutA, $cutB)")
    }
  }

  test("random filter+group+agg queries agree across API and SQL paths") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to 25).foreach { i =>
      val q = genQuery(params, seed).get
      seed = seed.next
      val api = viaApi(q).collect().map(_.toString).toSeq
      val sql = viaSql(q).collect().map(_.toString).toSeq
      assert(api == sql, s"case $i: $q\napi=$api\nsql=$sql")
    }
  }

  test("native text normalization == the regex composition it replaced") {
    // NormalizeWs/NormalizedTokens/WordShingles are single-pass rewrites of
    // trim(regexp_replace(lower(t),'\s+',' ')) + split + HOF shingles; the
    // dedup oracles pin them on fixture text — this pins them on
    // adversarial text: unicode letters, NBSP (NOT regex-\s whitespace —
    // must stay inside tokens), every ASCII \s char, empty and
    // all-whitespace strings, multi-byte boundaries.
    import org.apache.spark.sql.Column
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val genPiece: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Füße", "ΑΒΓΔ", "中文 文本", "ÅÉÎ", "a b", "ß", "ﬁ"),
      Gen.oneOf(wsChars).map(_.toString),
      Gen.listOfN(3, Gen.oneOf(wsChars)).map(_.mkString),
      Gen.const(""))
    val genText: Gen[String] =
      Gen.listOfN(8, genPiece).map(_.mkString)
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    val texts = (1 to 60).map { _ =>
      val t = genText(params, seed).get; seed = seed.next; t
    } ++ Seq("", " ", "\t\n\r", "a", " a ", "A B C")
    import spark.implicits._
    val df = texts.toDF("text")
    val legacyNorm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    def legacyShingles(toks: Column, k: Int): Column =
      filter(
        transform(toks, (_, i) =>
          when(i + k <= size(toks), array_join(slice(toks, i + 1, lit(k)), " "))),
        s => s.isNotNull)
    val rows = df.select(
      operators.Dedup.normalize(col("text")).as("nw"),
      legacyNorm.as("nw0"),
      operators.Dedup.tokens(col("text")).as("tk"),
      split(legacyNorm, " ").as("tk0"),
      operators.Dedup.shinglesOf(operators.Dedup.tokens(col("text")), 2).as("sh"),
      legacyShingles(split(legacyNorm, " "), 2).as("sh0")
    ).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.get(0) == r.get(1), s"normalize diverged on ${t.map(_.toInt)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"tokens diverged on ${t.map(_.toInt)}")
      assert(r.getSeq[String](4) == r.getSeq[String](5),
        s"shingles diverged on ${t.map(_.toInt)}")
    }
  }
}
