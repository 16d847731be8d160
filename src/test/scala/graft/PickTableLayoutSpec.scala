package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

/** Per-query layout selection over dual persisted layouts
  * (plans/PickTableLayout): ONE session with
  * `spark.graft.bucketedDir=orderkeyDir,custkeyDir` must serve the TPC-H
  * Q3 shape from the custkey layout (customer⋈orders co-located) AND the
  * h18 shape from the orderkey layout (orders⋈lineitem co-located), with
  * no conf flip — the round-13 verdict's dual-layout ask. */
class PickTableLayoutSpec extends AnyFunSuite {
  import TestSession._
  import operators.Bucketing

  /** Leaf locations (last path segment of the parent dir + table dir). */
  private def leafLocs(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.head.toString.split('/').takeRight(2).mkString("/")
        case other => other.toString
      }
    }

  private def withDualLayout[T](f: (String, String) => T): T = {
    val dirA = java.nio.file.Files.createTempDirectory("graft-lay-ok").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-lay-ck").toString
    // orderkey family in dirA; custkey family in dirB (lineitem only in A,
    // customer only in B — orders has BOTH layouts)
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "orders"), dirA, "orders", "o_orderkey", 4)
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "lineitem"), dirA, "lineitem", "l_orderkey", 4)
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "orders"), dirB, "orders", "o_custkey", 4)
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "customer"), dirB, "customer", "c_custkey", 4)
    try {
      spark.conf.set("spark.graft.bucketedDir", s"$dirA,$dirB")
      Tables.registerAll(spark, sf)
      f(dirA, dirB)
    } finally {
      spark.conf.unset("spark.graft.bucketedDir")
      Tables.registerAll(spark, sf)
      Seq("orders", "orders_l1", "lineitem", "customer", "customer_l1")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_bucketed_$t"))
    }
  }

  private val q3 = """
    SELECT l_orderkey,
      sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey"""

  private val h18 = """
    SELECT o_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey"""

  test("one session, no conf flip: q3 shape picks the custkey layout of " +
      "orders; h18 shape keeps the orderkey layout") {
    withDualLayout { (dirA, dirB) =>
      val q3Locs = leafLocs(spark.sql(q3))
      val ordersLoc = q3Locs.find(_.endsWith("orders_b")).get
      assert(ordersLoc.startsWith(dirB.split('/').last),
        s"q3 must serve orders from the custkey dir: $q3Locs")
      val h18Locs = leafLocs(spark.sql(h18))
      val h18Orders = h18Locs.find(_.endsWith("orders_b")).get
      assert(h18Orders.startsWith(dirA.split('/').last),
        s"h18 must serve orders from the orderkey dir: $h18Locs")
    }
  }

  test("the picked custkey join is CO-LOCATED: customer⋈orders plans " +
      "with no exchange below it") {
    withDualLayout { (_, _) =>
      val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val join = spark.sql("""
          SELECT count(*) AS n FROM customer
          JOIN orders ON c_custkey = o_custkey
          WHERE c_mktsegment = 'BUILDING'""")
        val phys = join.queryExecution.executedPlan.toString
        assert(!phys.contains("Exchange hashpartitioning"),
          "custkey join must be co-located:\n" + phys.take(1200))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }
  }

  /** Round-15: aggregate-based pick (the derived-partsupp shape of TPC-H
    * Q2/Q9) — a relation consumed by an AGGREGATE while still a bare unit
    * picks the sibling layout whose bucket keys are a subset of the
    * grouping keys, making the aggregation exchange-free. */
  test("aggregate over a bare unit picks the layout matching its " +
      "grouping keys; results identical") {
    val psShape = """
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey"""
    val flat = {
      Tables.registerAll(spark, sf)
      spark.sql(psShape).collect().map(_.toString).sorted.toSeq
    }
    val dirA = java.nio.file.Files.createTempDirectory("graft-lay-ok2").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-lay-pk").toString
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "lineitem"), dirA, "lineitem", "l_orderkey", 4)
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "lineitem"), dirB, "lineitem", "l_partkey", 4,
      "l_partkey,l_suppkey")
    try {
      spark.conf.set("spark.graft.bucketedDir", s"$dirA,$dirB")
      Tables.registerAll(spark, sf)
      val df = spark.sql(psShape)
      val locs = leafLocs(df)
      assert(locs.exists(_.startsWith(dirB.split('/').last)),
        s"aggregate must serve lineitem from the partkey dir: $locs")
      assert(df.collect().map(_.toString).sorted.toSeq == flat)
      // an orderkey-grouped aggregate keeps the default (first-dir) layout
      val keep = leafLocs(spark.sql(
        "SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey"))
      assert(keep.exists(_.startsWith(dirA.split('/').last)), keep.toString)
    } finally {
      spark.conf.unset("spark.graft.bucketedDir")
      Tables.registerAll(spark, sf)
      Seq("lineitem", "lineitem_l1")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_bucketed_$t"))
    }
  }

  /** Round-15 (ADVICE): sibling layouts are fingerprint-validated — a
    * sibling whose persisted row count disagrees with the primary layout
    * (a stale or partially rewritten copy) is dropped from the registry,
    * so no query can be served wrong rows through a swap. */
  test("a stale sibling layout (row-count mismatch) is never swapped in") {
    val psShape = """
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey"""
    val flat = {
      Tables.registerAll(spark, sf)
      spark.sql(psShape).collect().map(_.toString).sorted.toSeq
    }
    val dirA = java.nio.file.Files.createTempDirectory("graft-lay-ok3").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-lay-stale").toString
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "lineitem"), dirA, "lineitem", "l_orderkey", 4)
    // the "stale" sibling: half the rows, same schema and marker shape
    Bucketing.persistBucketed(spark,
      Tables.t(spark, sf, "lineitem")
        .filter(org.apache.spark.sql.functions.col("l_orderkey") % 2 === 0),
      dirB, "lineitem", "l_partkey", 4)
    try {
      spark.conf.set("spark.graft.bucketedDir", s"$dirA,$dirB")
      Tables.registerAll(spark, sf)
      val df = spark.sql(psShape)
      val locs = leafLocs(df)
      assert(!locs.exists(_.startsWith(dirB.split('/').last)),
        s"stale sibling must not serve: $locs")
      assert(df.collect().map(_.toString).sorted.toSeq == flat)
    } finally {
      spark.conf.unset("spark.graft.bucketedDir")
      Tables.registerAll(spark, sf)
      Seq("lineitem", "lineitem_l1")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_bucketed_$t"))
    }
  }

  test("results identical: dual-layout session vs flat, and pick-off " +
      "keeps the default layout") {
    val flat = {
      Tables.registerAll(spark, sf)
      spark.sql(q3).collect().map(_.toString).sorted.toSeq
    }
    withDualLayout { (dirA, _) =>
      val dual = spark.sql(q3).collect().map(_.toString).sorted.toSeq
      assert(dual == flat)
      spark.conf.set("spark.graft.layoutPick", "false")
      try {
        val locs = leafLocs(spark.sql(q3))
        val ordersLoc = locs.find(_.endsWith("orders_b")).get
        assert(ordersLoc.startsWith(dirA.split('/').last),
          s"pick-off must keep the default (first-dir) layout: $locs")
        val off = spark.sql(q3).collect().map(_.toString).sorted.toSeq
        assert(off == flat)
      } finally spark.conf.unset("spark.graft.layoutPick")
    }
  }
}
