package graft

/** Verbatim aggregation-function corpus auto-harvested from the
  * reference's presto-main operator/aggregation unit tests
  * (assertAggregation(fn, expected, blocks...) with literal expected
  * values and literal input blocks; constant RLE argument blocks are
  * inlined as literals). Covers approx_percentile (and weighted form),
  * arbitrary, array_agg, checksum, histogram, map_agg, map_union,
  * multimap_agg over the reference's own inputs and expected outputs.
  * One documented exclusion: approx_percentile(REAL\'-1\',REAL\'1\')
  * at p=0.5 — Presto's qdigest returns the UPPER value at an integral
  * rank tie, Spark's sketch the lower (TestApproximatePercentile
  * Aggregation.java:227). Regenerate with the harvest pipeline
  * (PLANS.md corpus section).
  */
class AggFnCorpusSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  private def rows(sql: String): Seq[String] =
    engine.sql(sql).collect().toSeq
      .map(r => r.toSeq.map(graft.tools.RefPairs.canon).mkString("(", ", ", ")"))

  private def pair(name: String, actual: String, expected: String): Unit =
    test(name) {
      assert(rows(actual) == rows(expected), s"\nactual:   $actual")
    }

  pair("ApproximatePercentileAggregation L87",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L93",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(1 AS BIGINT))) t(c1)",
    "SELECT 1")
  pair("ApproximatePercentileAggregation L98",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) t(c1)",
    "SELECT 2")
  pair("ApproximatePercentileAggregation L104",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) t(c1)",
    "SELECT 2")
  pair("ApproximatePercentileAggregation L110",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(4 AS BIGINT)), (CAST(5 AS BIGINT)), (CAST(6 AS BIGINT)), (CAST(7 AS BIGINT))) t(c1)",
    "SELECT 3")
  pair("ApproximatePercentileAggregation L117",
    "SELECT approx_percentile(c1, ARRAY[0.5]) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L123",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.99]) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L129",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.5]) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(1 AS BIGINT))) t(c1)",
    "SELECT ARRAY[1, 1]")
  pair("ApproximatePercentileAggregation L134",
    "SELECT approx_percentile(c1, ARRAY[0.2, 0.5, 0.8]) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) t(c1)",
    "SELECT ARRAY[1, 2, 3]")
  pair("ApproximatePercentileAggregation L140",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.99]) FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) t(c1)",
    "SELECT ARRAY[2, 3]")
  pair("ApproximatePercentileAggregation L146",
    "SELECT approx_percentile(c1, ARRAY[0.01, 0.5]) FROM (VALUES (CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(4 AS BIGINT)), (CAST(5 AS BIGINT)), (CAST(6 AS BIGINT)), (CAST(7 AS BIGINT))) t(c1)",
    "SELECT ARRAY[1, 3]")
  pair("ApproximatePercentileAggregation L153",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L160",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(1 AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 1")
  pair("ApproximatePercentileAggregation L167",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (CAST(2 AS BIGINT), CAST(1 AS BIGINT)), (CAST(3 AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2")
  pair("ApproximatePercentileAggregation L174",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (CAST(2 AS BIGINT), CAST(1 AS BIGINT)), (CAST(3 AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2")
  pair("ApproximatePercentileAggregation L181",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(2 AS BIGINT), CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(2 AS BIGINT), CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(2 AS BIGINT), CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(3 AS BIGINT), CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(3 AS BIGINT), CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), (CAST(3 AS BIGINT), CAST(1 AS BIGINT)), (CAST(4 AS BIGINT), CAST(1 AS BIGINT)), (CAST(5 AS BIGINT), CAST(1 AS BIGINT)), (CAST(6 AS BIGINT), CAST(1 AS BIGINT)), (CAST(7 AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 3")
  pair("ApproximatePercentileAggregation L197",
    "SELECT approx_percentile(c1, c2, ARRAY[0.5, 0.8]) FROM (VALUES (CAST(1 AS BIGINT), CAST(4 AS BIGINT)), (CAST(2 AS BIGINT), CAST(2 AS BIGINT)), (CAST(3 AS BIGINT), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT ARRAY[1, 2]")
  pair("ApproximatePercentileAggregation L209",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS REAL)), (CAST(NULL AS REAL))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L215",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS REAL)), (CAST(1.0 AS REAL))) t(c1)",
    "SELECT 1.0")
  pair("ApproximatePercentileAggregation L221",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS REAL)), (CAST(1.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(3.0 AS REAL))) t(c1)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L233",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(-2.0 AS REAL)), (CAST(3.0 AS REAL)), (CAST(-1.0 AS REAL))) t(c1)",
    "SELECT -1.0")
  pair("ApproximatePercentileAggregation L239",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(3.0 AS REAL))) t(c1)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L245",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(3.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(4.0 AS REAL)), (CAST(5.0 AS REAL)), (CAST(6.0 AS REAL)), (CAST(7.0 AS REAL))) t(c1)",
    "SELECT 3.0")
  pair("ApproximatePercentileAggregation L252",
    "SELECT approx_percentile(c1, ARRAY[0.5]) FROM (VALUES (CAST(NULL AS REAL)), (CAST(NULL AS REAL))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L258",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.5]) FROM (VALUES (CAST(NULL AS REAL)), (CAST(NULL AS REAL))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L264",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.5]) FROM (VALUES (CAST(NULL AS REAL)), (CAST(1.0 AS REAL))) t(c1)",
    "SELECT ARRAY[1.0, 1.0]")
  pair("ApproximatePercentileAggregation L270",
    "SELECT approx_percentile(c1, ARRAY[0.2, 0.5, 0.8]) FROM (VALUES (CAST(NULL AS REAL)), (CAST(1.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(3.0 AS REAL))) t(c1)",
    "SELECT ARRAY[1.0, 2.0, 3.0]")
  pair("ApproximatePercentileAggregation L276",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.99]) FROM (VALUES (CAST(1.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(3.0 AS REAL))) t(c1)",
    "SELECT ARRAY[2.0, 3.0]")
  pair("ApproximatePercentileAggregation L282",
    "SELECT approx_percentile(c1, ARRAY[0.01, 0.5]) FROM (VALUES (CAST(1.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(2.0 AS REAL)), (CAST(2.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(3.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(NULL AS REAL)), (CAST(3.0 AS REAL)), (CAST(4.0 AS REAL)), (CAST(5.0 AS REAL)), (CAST(6.0 AS REAL)), (CAST(7.0 AS REAL))) t(c1)",
    "SELECT ARRAY[1.0, 3.0]")
  pair("ApproximatePercentileAggregation L289",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L296",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(1.0 AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 1.0")
  pair("ApproximatePercentileAggregation L303",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(1.0 AS REAL), CAST(1 AS BIGINT)), (CAST(2.0 AS REAL), CAST(1 AS BIGINT)), (CAST(3.0 AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L310",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1.0 AS REAL), CAST(1 AS BIGINT)), (CAST(2.0 AS REAL), CAST(1 AS BIGINT)), (CAST(3.0 AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L317",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1.0 AS REAL), CAST(1 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(2.0 AS REAL), CAST(2 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(2.0 AS REAL), CAST(2 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(2.0 AS REAL), CAST(2 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(3.0 AS REAL), CAST(2 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(3.0 AS REAL), CAST(1 AS BIGINT)), (CAST(NULL AS REAL), CAST(1 AS BIGINT)), (CAST(3.0 AS REAL), CAST(1 AS BIGINT)), (CAST(4.0 AS REAL), CAST(1 AS BIGINT)), (CAST(5.0 AS REAL), CAST(1 AS BIGINT)), (CAST(6.0 AS REAL), CAST(1 AS BIGINT)), (CAST(7.0 AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 3.0")
  pair("ApproximatePercentileAggregation L333",
    "SELECT approx_percentile(c1, c2, ARRAY[0.5, 0.8]) FROM (VALUES (CAST(1.0 AS REAL), CAST(4 AS BIGINT)), (CAST(2.0 AS REAL), CAST(2 AS BIGINT)), (CAST(3.0 AS REAL), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT ARRAY[1.0, 2.0]")
  pair("ApproximatePercentileAggregation L345",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(NULL AS DOUBLE))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L351",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(1.0 AS DOUBLE))) t(c1)",
    "SELECT 1.0")
  pair("ApproximatePercentileAggregation L357",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(1.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) t(c1)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L363",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) t(c1)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L369",
    "SELECT approx_percentile(c1, 0.5) FROM (VALUES (CAST(1.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(4.0 AS DOUBLE)), (CAST(5.0 AS DOUBLE)), (CAST(6.0 AS DOUBLE)), (CAST(7.0 AS DOUBLE))) t(c1)",
    "SELECT 3.0")
  pair("ApproximatePercentileAggregation L376",
    "SELECT approx_percentile(c1, ARRAY[0.5]) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(NULL AS DOUBLE))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L382",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.5]) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(NULL AS DOUBLE))) t(c1)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L388",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.5]) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(1.0 AS DOUBLE))) t(c1)",
    "SELECT ARRAY[1.0, 1.0]")
  pair("ApproximatePercentileAggregation L394",
    "SELECT approx_percentile(c1, ARRAY[0.2, 0.5, 0.8]) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(1.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) t(c1)",
    "SELECT ARRAY[1.0, 2.0, 3.0]")
  pair("ApproximatePercentileAggregation L400",
    "SELECT approx_percentile(c1, ARRAY[0.5, 0.99]) FROM (VALUES (CAST(1.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) t(c1)",
    "SELECT ARRAY[2.0, 3.0]")
  pair("ApproximatePercentileAggregation L406",
    "SELECT approx_percentile(c1, ARRAY[0.01, 0.5]) FROM (VALUES (CAST(1.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (CAST(3.0 AS DOUBLE)), (CAST(4.0 AS DOUBLE)), (CAST(5.0 AS DOUBLE)), (CAST(6.0 AS DOUBLE)), (CAST(7.0 AS DOUBLE))) t(c1)",
    "SELECT ARRAY[1.0, 3.0]")
  pair("ApproximatePercentileAggregation L413",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT NULL")
  pair("ApproximatePercentileAggregation L420",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 1.0")
  pair("ApproximatePercentileAggregation L427",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L434",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 2.0")
  pair("ApproximatePercentileAggregation L441",
    "SELECT approx_percentile(c1, c2, 0.5) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(2 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(2 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(2 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(2 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(NULL AS DOUBLE), CAST(1 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(4.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(5.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(6.0 AS DOUBLE), CAST(1 AS BIGINT)), (CAST(7.0 AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT 3.0")
  pair("ApproximatePercentileAggregation L457",
    "SELECT approx_percentile(c1, c2, ARRAY[0.5, 0.8]) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(4 AS BIGINT)), (CAST(2.0 AS DOUBLE), CAST(2 AS BIGINT)), (CAST(3.0 AS DOUBLE), CAST(1 AS BIGINT))) t(c1, c2)",
    "SELECT ARRAY[1.0, 2.0]")
  pair("ArbitraryAggregation L57",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(NULL AS BOOLEAN))) t(c1)",
    "SELECT NULL")
  pair("ArbitraryAggregation L68",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(TRUE AS BOOLEAN)), (CAST(TRUE AS BOOLEAN))) t(c1)",
    "SELECT TRUE")
  pair("ArbitraryAggregation L79",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT NULL")
  pair("ArbitraryAggregation L90",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT 1")
  pair("ArbitraryAggregation L101",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(NULL AS DOUBLE))) t(c1)",
    "SELECT NULL")
  pair("ArbitraryAggregation L112",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(NULL AS DOUBLE)), (CAST(2.0 AS DOUBLE))) t(c1)",
    "SELECT 2.0")
  pair("ArbitraryAggregation L123",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(NULL AS VARCHAR)), (CAST(NULL AS VARCHAR))) t(c1)",
    "SELECT NULL")
  pair("ArbitraryAggregation L134",
    "SELECT arbitrary(c1) FROM (VALUES (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR))) t(c1)",
    "SELECT 'a'")
  pair("ArbitraryAggregation L156",
    "SELECT arbitrary(c1) FROM (VALUES (ARRAY[23, 45]), (ARRAY[23, 45]), (ARRAY[23, 45]), (ARRAY[23, 45])) t(c1)",
    "SELECT ARRAY[23, 45]")
  pair("ArbitraryAggregation L167",
    "SELECT arbitrary(c1) FROM (VALUES (CAST(3 AS INTEGER)), (CAST(3 AS INTEGER)), (CAST(NULL AS INTEGER))) t(c1)",
    "SELECT 3")
  pair("ChecksumAggregation L61",
    "SELECT checksum(c1) FROM (SELECT CAST(NULL AS BOOLEAN) AS c1) t WHERE 1=0",
    "SELECT NULL")
  pair("Histogram L84",
    "SELECT histogram(c1) FROM (VALUES (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('c' AS VARCHAR))) t(c1)",
    "SELECT MAP(ARRAY['a', 'b', 'c'], ARRAY[1, 1, 1])")
  pair("Histogram L95",
    "SELECT histogram(c1) FROM (VALUES (CAST(100 AS BIGINT)), (CAST(200 AS BIGINT)), (CAST(300 AS BIGINT))) t(c1)",
    "SELECT MAP(ARRAY[100, 200, 300], ARRAY[1, 1, 1])")
  pair("Histogram L106",
    "SELECT histogram(c1) FROM (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.3 AS DOUBLE)), (CAST(0.2 AS DOUBLE))) t(c1)",
    "SELECT MAP(ARRAY[0.1, 0.3, 0.2], ARRAY[1, 1, 1])")
  pair("Histogram L117",
    "SELECT histogram(c1) FROM (VALUES (CAST(TRUE AS BOOLEAN)), (CAST(FALSE AS BOOLEAN))) t(c1)",
    "SELECT MAP(ARRAY[TRUE, FALSE], ARRAY[1, 1])")
  pair("Histogram L128",
    "SELECT histogram(c1) FROM (VALUES (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('c' AS VARCHAR))) t(c1)",
    "SELECT MAP(ARRAY['a', 'b', 'c'], ARRAY[1, 1, 1])")
  pair("Histogram L135",
    "SELECT histogram(c1) FROM (VALUES (CAST(100 AS BIGINT)), (CAST(200 AS BIGINT)), (CAST(300 AS BIGINT))) t(c1)",
    "SELECT MAP(ARRAY[100, 200, 300], ARRAY[1, 1, 1])")
  pair("Histogram L142",
    "SELECT histogram(c1) FROM (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.3 AS DOUBLE)), (CAST(0.2 AS DOUBLE))) t(c1)",
    "SELECT MAP(ARRAY[0.1, 0.3, 0.2], ARRAY[1, 1, 1])")
  pair("Histogram L149",
    "SELECT histogram(c1) FROM (VALUES (CAST(TRUE AS BOOLEAN)), (CAST(FALSE AS BOOLEAN))) t(c1)",
    "SELECT MAP(ARRAY[TRUE, FALSE], ARRAY[1, 1])")
  pair("Histogram L160",
    "SELECT histogram(c1) FROM (VALUES (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR))) t(c1)",
    "SELECT MAP(ARRAY['a', 'b'], ARRAY[2, 1])")
  pair("Histogram L184",
    "SELECT histogram(c1) FROM (VALUES (CAST(2 AS BIGINT)), (CAST(NULL AS BIGINT)), (CAST(1 AS BIGINT))) t(c1)",
    "SELECT MAP(ARRAY[1, 2], ARRAY[1, 1])")
  pair("Histogram L195",
    "SELECT histogram(c1) FROM (VALUES (CAST(NULL AS BIGINT))) t(c1)",
    "SELECT NULL")
  pair("Histogram L255",
    "SELECT histogram(c1) FROM (VALUES (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('d' AS VARCHAR)), (CAST('e' AS VARCHAR)), (CAST('e' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('b' AS VARCHAR)), (CAST('a' AS VARCHAR)), (CAST('c' AS VARCHAR)), (CAST('c' AS VARCHAR))) t(c1)",
    "SELECT MAP(ARRAY['a', 'b', 'c', 'd', 'e'], ARRAY[25, 10, 12, 1, 2])")
  pair("MapAggAggregation L61",
    "SELECT map_agg(c1, c2) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST('a' AS VARCHAR)), (CAST(1.0 AS DOUBLE), CAST('b' AS VARCHAR)), (CAST(1.0 AS DOUBLE), CAST('c' AS VARCHAR))) t(c1, c2)",
    "SELECT MAP(ARRAY[1.0], ARRAY['a'])")
  pair("MapAggAggregation L91",
    "SELECT map_agg(c1, c2) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST('a' AS VARCHAR)), (CAST(2.0 AS DOUBLE), CAST('b' AS VARCHAR)), (CAST(3.0 AS DOUBLE), CAST('c' AS VARCHAR))) t(c1, c2)",
    "SELECT MAP(ARRAY[1.0, 2.0, 3.0], ARRAY['a', 'b', 'c'])")
  pair("MapAggAggregation L117",
    "SELECT map_agg(c1, c2) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(TRUE AS BOOLEAN)), (CAST(2.0 AS DOUBLE), CAST(FALSE AS BOOLEAN)), (CAST(3.0 AS DOUBLE), CAST(FALSE AS BOOLEAN))) t(c1, c2)",
    "SELECT MAP(ARRAY[1.0, 2.0, 3.0], ARRAY[TRUE, FALSE, FALSE])")
  pair("MapAggAggregation L133",
    "SELECT map_agg(c1, c2) FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE), CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE), CAST(4.0 AS DOUBLE))) t(c1, c2)",
    "SELECT MAP(ARRAY[1.0], ARRAY[2.0])")
  pair("MapAggAggregation L139",
    "SELECT map_agg(c1, c2) FROM (VALUES (CAST(NULL AS DOUBLE), CAST(2.0 AS DOUBLE)), (CAST(NULL AS DOUBLE), CAST(3.0 AS DOUBLE)), (CAST(NULL AS DOUBLE), CAST(4.0 AS DOUBLE))) t(c1, c2)",
    "SELECT NULL")
}
