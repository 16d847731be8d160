package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Keyword retrieval over the document corpus: BM25 scoring (Robertson &
  * Zaragoza 2009, the Lucene-standard formulation with the +1-inside-log
  * idf that keeps scores positive) expressed as the inverted-index join
  * shape a search/training-data-curation pipeline runs at corpus scale.
  *
  * Scale design:
  *   - The query-term filter lands BEFORE the term-frequency aggregation,
  *     so the posting shuffle carries only matching (doc, term) rows —
  *     O(matches), not O(corpus tokens).
  *   - Per-term document frequencies and the global (N, avgdl) statistics
  *     are tiny relations joined via `broadcast` — no corpus-sized side in
  *     any join build.
  *   - Document lengths are one corpus-wide aggregate (shuffle width =
  *     documents); everything downstream is per-matching-doc.
  *   - Nothing collects to the driver; top-k is TakeOrderedAndProject.
  */
object Retrieval {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private def terms(textCol: Column): Column =
    regexp_extract_all(lower(textCol), lit("[a-z]+"), lit(0))

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1). Returns
    * (doc_id, n_terms, score) for the `topK` best documents, ordered by
    * (rounded score DESC, doc_id) — a total order, so the LIMIT is
    * deterministic across engines. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(terms(col(textCol))).as("term"))
    val dl = toks.groupBy("doc_id")
      .agg(count(lit(1)).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("term").isInCollection(query))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * col("tf") * (k1 + 1)
          / (col("tf") + (col("dl") / col("avgdl") * (k1 * b) + k1 * (1 - b))))
          .as("s"))
    contrib.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"),
        round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  val queries: Map[String, Q] = Map(

    // BM25 keyword retrieval: the DuckDB oracle recomputes the full
    // pipeline (doc lengths over ALL tokens, query-filtered postings,
    // per-term df, idf, the saturation term) — a wrong tokenization,
    // length normalization, or idf form hash-fails. Scores are rounded
    // to 1e-6 (double summation order is not associative) and the top-k
    // order is totalized by (score, doc_id).
    "s10_bm25" -> Q(
      (s, d) => bm25(docs(s, d), "doc_id", "text",
        Seq("join", "stream", "fast"), topK = 20),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents),
        dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
          FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
          FROM dl),
        tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks
          WHERE term IN ('join', 'stream', 'fast') GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM tf GROUP BY term),
        contrib AS (SELECT tf.doc_id,
            ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
          FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats)
        SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
          round(SUM(s), 6) AS score
        FROM contrib GROUP BY doc_id
        ORDER BY round(SUM(s), 6) DESC, doc_id LIMIT 20"""))
  )
}
