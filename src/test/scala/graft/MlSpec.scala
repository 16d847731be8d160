package graft

import org.scalatest.funsuite.AnyFunSuite

/** presto-ml surface: learn/predict round trips through SQL aggregation
  * (the reference's TestMLFunctions / TestLearnAggregations shapes). */
class MlSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark).loadCatalog(sf)

  private def one(sql: String): Any = engine.sql(sql).head.get(0)

  test("learn_regressor recovers an exact linear function") {
    // y = 3 + 2*x1 - 0.5*x2 on a deterministic grid
    val v = one("""
      WITH pts AS (
        SELECT CAST(id % 17 AS DOUBLE) AS x1, CAST(id % 5 AS DOUBLE) AS x2,
          3.0 + 2.0 * CAST(id % 17 AS DOUBLE) - 0.5 * CAST(id % 5 AS DOUBLE) AS y
        FROM range(200)),
      m AS (SELECT learn_regressor(y, features(x1, x2)) AS model FROM pts)
      SELECT round(regress(features(10.0, 4.0), model), 6) FROM m""")
    assert(v == 3.0 + 2.0 * 10 - 0.5 * 4)
  }

  test("learn_regressor matches the closed-form simple regression") {
    // single feature: normal equations == the textbook slope/intercept
    val rows = engine.sql("""
      WITH pts AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem),
      m AS (SELECT learn_regressor(y, features(x)) AS model FROM pts),
      cf AS (
        SELECT (count(*) * sum(x*y) - sum(x) * sum(y)) /
               (count(*) * sum(x*x) - sum(x) * sum(x)) AS slope,
               avg(y) - (count(*) * sum(x*y) - sum(x) * sum(y)) /
               (count(*) * sum(x*x) - sum(x) * sum(x)) * avg(x) AS icept
        FROM pts)
      SELECT round(regress(features(25.0), model), 4) AS pred,
             round(icept + slope * 25.0, 4) AS expect
      FROM m, cf""").head
    assert(rows.getDouble(0) == rows.getDouble(1))
  }

  test("learn_classifier separates linearly separable data") {
    // label = 1 iff x1 + x2 > 10, trained on a grid, tested off-grid
    val v = engine.sql("""
      WITH pts AS (
        SELECT CAST(id % 11 AS DOUBLE) AS x1, CAST(id DIV 11 AS DOUBLE) AS x2,
          CASE WHEN (id % 11) + (id DIV 11) > 10 THEN 1 ELSE 0 END AS label
        FROM range(121)),
      m AS (SELECT learn_classifier(label, features(x1, x2)) AS model FROM pts)
      SELECT classify(features(9.0, 9.0), model) AS hi,
             classify(features(1.0, 2.0), model) AS lo FROM m""").head
    assert(v.getLong(0) == 1L && v.getLong(1) == 0L)
  }

  test("learn_libsvm_* aliases accept a params string") {
    val v = one("""
      WITH pts AS (
        SELECT CAST(id AS DOUBLE) AS x, 2.0 * id + 1.0 AS y FROM range(50)),
      m AS (SELECT learn_libsvm_regressor(y, features(x), '-e 0.1') AS model
            FROM pts)
      SELECT round(regress(features(7.0), model), 6) FROM m""")
    assert(v == 15.0)
  }

  test("evaluate_classifier_predictions renders the reference summary") {
    val s = one("""
      SELECT evaluate_classifier_predictions(truth, pred) FROM VALUES
        (1, 1), (1, 1), (1, 0), (0, 0), (0, 1), (0, 0) AS t(truth, pred)""")
      .asInstanceOf[String]
    assert(s.startsWith("Accuracy: 4/6 (66.67%)\n"), s)
    assert(s.contains("Class '0'\nPrecision: 2/3 (66.67%)\nRecall: 2/3 (66.67%)\n"), s)
    assert(s.contains("Class '1'\nPrecision: 2/3 (66.67%)\nRecall: 2/3 (66.67%)\n"), s)
  }

  test("model shuffles through partial aggregation (grouped learn)") {
    // one model per group; each group's own linear law is recovered
    val rows = engine.sql("""
      WITH pts AS (
        SELECT CAST(id % 3 AS BIGINT) AS grp, CAST(id AS DOUBLE) AS x,
          (CAST(id % 3 AS DOUBLE) + 1.0) * CAST(id AS DOUBLE) AS y
        FROM range(300)),
      m AS (SELECT grp, learn_regressor(y, features(x)) AS model
            FROM pts GROUP BY grp)
      SELECT grp, round(regress(features(100.0), model), 4) AS pred
      FROM m ORDER BY grp""").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 100.0), (1L, 200.0), (2L, 300.0)))
  }
}
