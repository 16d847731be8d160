package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-hit heuristic), quality scoring, token counting, document
  * fingerprinting. All pure expression trees over the `documents` table —
  * map-only at cluster scale (no shuffle until the final aggregate).
  */
object TextAnalysis {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private val norm: Column => Column = Dedup.normalize

  /** Marker token sets per language (tiny-vocab heuristic; the fixture text
    * is synthetic English-ish SQL vocabulary, so markers are drawn from it —
    * the operator shape, not a linguistics claim). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "fast", "slow"),
    "sql" -> Seq("join", "filter", "scan", "agg", "query", "sort"),
    "data" -> Seq("row", "column", "table", "value", "data"),
    "stream" -> Seq("stream", "window", "batch", "merge"))

  def markerHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  val queries: Map[String, Q] = Map(

    // Language-ID heuristic: argmax of marker-set hit counts (deterministic
    // tie-break by category name order en > sql > data > stream).
    "t01_lang_id" -> Q(
      (s, d) => {
        val hits = markers.toSeq.sortBy(_._1).map { case (k, ws) =>
          markerHits(col("t"), ws).as(s"h_$k")
        }
        docs(s, d)
          .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
          .select(col("doc_id") +: hits: _*)
          .withColumn("predicted",
            when(col("h_en") >= greatest(col("h_sql"), col("h_data"), col("h_stream")), "en")
              .when(col("h_sql") >= greatest(col("h_data"), col("h_stream")), "sql")
              .when(col("h_data") >= col("h_stream"), "data")
              .otherwise("stream"))
          .groupBy("predicted")
          .agg(count(lit(1)).as("n"),
            sum(col("h_en") + col("h_sql") + col("h_data") + col("h_stream"))
              .cast("long").as("total_hits"))
          .orderBy("predicted")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
          FROM documents),
        hits AS (
          SELECT doc_id,
            CAST(len(list_filter(t, x -> x IN ('row','column','table','value','data'))) AS INT) AS h_data,
            CAST(len(list_filter(t, x -> x IN ('the','a','fast','slow'))) AS INT) AS h_en,
            CAST(len(list_filter(t, x -> x IN ('join','filter','scan','agg','query','sort'))) AS INT) AS h_sql,
            CAST(len(list_filter(t, x -> x IN ('stream','window','batch','merge'))) AS INT) AS h_stream
          FROM toks)
        SELECT CASE
            WHEN h_en >= greatest(h_sql, h_data, h_stream) THEN 'en'
            WHEN h_sql >= greatest(h_data, h_stream) THEN 'sql'
            WHEN h_data >= h_stream THEN 'data'
            ELSE 'stream' END AS predicted,
          count(*) AS n,
          CAST(sum(h_en + h_sql + h_data + h_stream) AS BIGINT) AS total_hits
        FROM hits GROUP BY 1 ORDER BY predicted""")),

    // Quality scoring: length, token stats, punctuation/whitespace ratios,
    // stopword ratio, composite keep/drop flag.
    "t02_quality_score" -> Q(
      (s, d) => {
        val toks = col("t")
        docs(s, d)
          .select(col("doc_id"), col("text"), Dedup.tokens(col("text")).as("t"))
          .select(
          col("doc_id"),
          length(col("text")).as("n_chars_m"),
          size(toks).as("n_tokens"),
          round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
            length(col("text")).cast("double"), 6).as("alpha_ratio"),
          round(size(filter(toks, t => t.isInCollection(Seq("the", "a", "and", "of"))))
            .cast("double") / size(toks).cast("double"), 6).as("stopword_ratio"),
          round(aggregate(transform(toks, t => length(t)), lit(0),
            (acc, x) => acc + x).cast("double") / size(toks).cast("double"), 6)
            .as("avg_token_len"))
          .withColumn("keep",
            col("n_tokens") >= 10 && col("alpha_ratio") > 0.6 && col("avg_token_len") < 12)
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, text,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
          FROM documents)
        SELECT doc_id,
          length(text) AS n_chars_m,
          CAST(len(t) AS INT) AS n_tokens,
          round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
            CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
          round(CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS DOUBLE) /
            CAST(len(t) AS DOUBLE), 6) AS stopword_ratio,
          round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) /
            CAST(len(t) AS DOUBLE), 6) AS avg_token_len,
          (len(t) >= 10 AND
            round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
              CAST(length(text) AS DOUBLE), 6) > 0.6 AND
            round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) /
              CAST(len(t) AS DOUBLE), 6) < 12) AS keep
        FROM toks ORDER BY doc_id""")),

    // Token counting: whitespace tokens + BPE-ish regex tokens (word pieces
    // and standalone punctuation) + chars-per-token.
    "t03_token_count" -> Q(
      (s, d) => docs(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .as("re_tokens"),
        round(length(col("text")).cast("double") /
          size(split(trim(col("text")), "\\s+")).cast("double"), 6).as("chars_per_tok"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS re_tokens,
          round(CAST(length(text) AS DOUBLE) /
            CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 6) AS chars_per_tok
        FROM documents ORDER BY doc_id""")),

    // Character-level Shannon entropy — a perplexity proxy for quality
    // filtering (gibberish/binary-noise docs score far from prose). The
    // distinct-char list is sorted on BOTH sides so the double summation
    // order is identical → hash-exact. chars/n are bound attributes (HOF
    // lambdas re-evaluate non-attribute subtrees per element).
    "t05_char_entropy" -> Q(
      (s, d) => docs(s, d)
        .select(col("doc_id"), split(col("text"), "").as("chars"))
        .select(col("doc_id"), col("chars"),
          sort_array(array_distinct(col("chars"))).as("dl"),
          size(col("chars")).cast("double").as("n"))
        .select(col("doc_id"), col("n").cast("long").as("n_chars"),
          round(expr("""
            0.0 - aggregate(
              transform(dl, c ->
                (size(filter(chars, x -> x = c)) / n) *
                log2(size(filter(chars, x -> x = c)) / n)),
              cast(0.0 as double), (a, p) -> a + p)"""), 6).as("entropy"))
        .orderBy("doc_id"),
      Some("""
        WITH c AS (
          SELECT doc_id,
            list_transform(range(1, length(text) + 1),
              i -> substr(text, CAST(i AS INT), 1)) AS chars
          FROM documents),
        d AS (
          SELECT doc_id, chars, list_sort(list_distinct(chars)) AS dl,
            CAST(len(chars) AS DOUBLE) AS n
          FROM c)
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
          round(0.0 - list_sum(list_transform(dl, ch ->
            (len(list_filter(chars, x -> x = ch)) / n) *
            log2(len(list_filter(chars, x -> x = ch)) / n))), 6) AS entropy
        FROM d ORDER BY doc_id""")),

    // Stratified (class-balanced) sampling — the training-mix operation:
    // per-language fractions via sampleBy. Per-stratum populations are
    // hash-checked; the sampled size is pinned by a Bernoulli bound.
    "t06_stratified_sample" -> Q(
      (s, d) => {
        val fractions = Map("en" -> 0.5, "es" -> 0.25, "zh" -> 0.25)
        val sampled = docs(s, d)
          .stat.sampleBy("lang", fractions, seed = 42L)
          .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        val totals = docs(s, d).filter(col("lang").isin(fractions.keys.toSeq: _*))
          .groupBy("lang").agg(count(lit(1)).as("n_total"))
        totals.join(sampled, Seq("lang"), "left")
          .select(col("lang"), col("n_total"),
            (coalesce(col("n_sampled"), lit(0L)) >=
              col("n_total") * when(col("lang") === "en", 0.25).otherwise(0.05) &&
             coalesce(col("n_sampled"), lit(0L)) <=
              col("n_total") * when(col("lang") === "en", 0.75).otherwise(0.50))
              .as("fraction_ok"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, count(*) AS n_total, true AS fraction_ok
        FROM documents WHERE lang IN ('en', 'es', 'zh')
        GROUP BY lang ORDER BY lang""")),

    // Document fingerprinting: md5 content fingerprint + cheap rolling-hash
    // style prefix/suffix fingerprints for fast prefiltering.
    "t04_fingerprint" -> Q(
      (s, d) => docs(s, d).select(
        col("doc_id"),
        Dedup.fingerprint(col("text")).as("fp"),
        md5(substring(norm(col("text")), 1, 64).cast("binary")).as("fp_prefix"),
        md5(reverse(substring(reverse(norm(col("text"))), 1, 64)).cast("binary"))
          .as("fp_suffix"))
        .orderBy("doc_id"),
      Some("""
        WITH n AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
          FROM documents)
        SELECT doc_id,
          md5(nt) AS fp,
          md5(substr(nt, 1, 64)) AS fp_prefix,
          md5(CASE WHEN length(nt) <= 64 THEN nt
                   ELSE substr(nt, length(nt) - 63, 64) END) AS fp_suffix
        FROM n ORDER BY doc_id"""))
  )
}
