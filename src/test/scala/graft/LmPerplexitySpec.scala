package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** lmPerplexity (operators/TextAnalysis.scala): bigram-LM quality scoring
  * — the CCNet perplexity-filter shape. The uncapped path is DuckDB-
  * oracled (t11); these tests pin the semantics the oracle can't: the
  * maxVocab OOV bucket, the score's discriminative direction, and the
  * plan shape (model broadcast, no corpus-sized model shuffle). */
class LmPerplexitySpec extends AnyFunSuite {
  import TestSession._
  import operators.TextAnalysis

  private def fixture = {
    import spark.implicits._
    // predictable docs repeat one bigram chain; the odd doc is shuffled
    val predictable = (0L until 8L).map(i =>
      (i, "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta"))
    val surprising = Seq(
      (100L, "gamma alpha alpha gamma beta beta alpha gamma beta gamma alpha"))
    (predictable ++ surprising).toDF("doc_id", "text")
  }

  test("repetitive text scores lower perplexity than shuffled text") {
    val scores = TextAnalysis.lmPerplexity(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val predictable = scores.filterKeys(_ < 100L).values
    assert(predictable.forall(_ < scores(100L)),
      s"predictable=$predictable surprising=${scores(100L)}")
  }

  test("maxVocab buckets rare tokens into <oov> and bounds the model") {
    import spark.implicits._
    // 'rare1'/'rare2' appear once each; with maxVocab=3 they collapse to
    // the same OOV bucket, so the two docs score IDENTICALLY
    val df = Seq(
      (1L, "alpha beta alpha beta alpha rare1 beta alpha"),
      (2L, "alpha beta alpha beta alpha rare2 beta alpha"),
      (3L, "alpha beta alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val capped = TextAnalysis.lmPerplexity(df, "doc_id", "text", maxVocab = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(capped(1L) == capped(2L), s"${capped(1L)} vs ${capped(2L)}")
    // uncapped they differ from doc 3 but still equal each other by symmetry
    val uncapped = TextAnalysis.lmPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uncapped(1L) == uncapped(2L))
    assert(capped(3L)._2 < capped(1L)._2) // clean doc beats OOV doc
  }

  test("model joins broadcast; the only corpus-sized shuffle is per-doc") {
    val plan = TextAnalysis.lmPerplexity(fixture, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }

  test("n_bigrams = tokens - 1 per document") {
    val rows = TextAnalysis.lmPerplexity(fixture, "doc_id", "text").collect()
    assert(rows.forall(_.getLong(1) == 10L)) // 11 tokens per fixture doc
  }
}
