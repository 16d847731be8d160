package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Trained byte-pair-encoding (BPE) tokenizer — the training-data-pipeline
  * operator behind every modern LM vocabulary (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"; the
  * GPT-2/sentencepiece training shape).
  *
  * Scale design (the part that matters at 100 TB):
  *   - TRAINING never iterates over the corpus. One distributed pass
  *     builds the word-frequency table (`wordFreq`: explode → groupBy —
  *     a single shuffle whose width is the DISTINCT vocabulary, not the
  *     corpus); the top-`maxWords` head is collected (bounded driver
  *     state, the same pattern as k-means centroids / dynamic-filter key
  *     probes) and the merge loop runs locally over that dictionary —
  *     O(numMerges × vocab), independent of corpus size. This is exactly
  *     how sentencepiece/GPT-2 train: BPE statistics live on the word
  *     histogram, not the raw text.
  *   - ENCODING is a map-only pass: the learned merge list (a few KB)
  *     ships in the task closure (broadcast regime) and each document
  *     tokenizes independently — no shuffle until the caller aggregates.
  *
  * Merge semantics (pinned identically in the DuckDB oracle): a word's
  * state is its symbols joined/delimited by single spaces (" h e l l o ");
  * applying merge (l, r) is a plain left-to-right non-overlapping string
  * replace of " l r " with " lr " — Java's `String.replace` and DuckDB's
  * `replace` agree on this scan (verified: " a a a " → " aa a " in both),
  * so the oracle replays training AND encoding exactly, with ties broken
  * by (count DESC, left ASC, right ASC) — ASCII-only symbols, so Scala
  * and DuckDB string orderings coincide. Words are lowercase alpha runs
  * (`[a-z]+`), making every base character its own initial token.
  *
  * One pinned divergence from classic greedy BPE (BpeSpec): on a run of
  * a repeated symbol the scan consumes the shared delimiter, so
  * occurrences 1,3,5,… fuse ("aaaaa" → [aa, a, aa], classic gives
  * [aa, aa, a]). The token multiset is identical, tokens always
  * reconstruct their word, and the oracle replays the exact same scan.
  */
object Bpe {

  /** One learned merge: at `rank`, symbols `left`+`right` (whose adjacent
    * pair count at selection time was `cnt`) fuse into one token. */
  case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** word → delimited symbol state: "hello" → " h e l l o ". */
  def initState(word: String): String = " " + word.mkString(" ") + " "

  /** Left-to-right non-overlapping application of one merge. */
  def applyMerge(state: String, l: String, r: String): String =
    state.replace(" " + l + " " + r + " ", " " + l + r + " ")

  /** Classic BPE training over a word-frequency dictionary: each round
    * counts adjacent symbol pairs weighted by word frequency (multiplicity
    * within a word counts, as in the original algorithm), fuses the
    * most frequent pair, and rewrites the dictionary. Stops early if no
    * pairs remain. */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var state = words.map { case (w, c) => (initState(w), c) }
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (st, c) =>
        val syms = st.trim.split(' ')
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        out += Merge(rank, l, r, c)
        state = state.map { case (st, cc) => (applyMerge(st, l, r), cc) }
        rank += 1
      }
    }
    out.result()
  }

  /** Tokenize one word by applying the learned merges in rank order. */
  def encodeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var st = initState(word)
    merges.foreach(m => st = applyMerge(st, m.left, m.right))
    st.trim.split(' ')
  }

  /** Distributed word-frequency head: ONE corpus pass (explode + groupBy
    * on the distinct vocabulary), deterministic top-`maxWords` cut
    * (count DESC, word ASC), bounded collect. */
  def wordFreq(spark: SparkSession, dir: String, maxWords: Int): Seq[(String, Long)] = {
    import spark.implicits._
    Tables.t(spark, dir, "documents")
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
        lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
  }

  /** End-to-end trainer: corpus → word histogram → merge list. */
  def trainFromCorpus(spark: SparkSession, dir: String,
      numMerges: Int, maxWords: Int): Seq[Merge] =
    train(wordFreq(spark, dir, maxWords), numMerges)

  /** Map-only corpus tokenization with a trained merge list: per document,
    * the flattened word-order token stream (tokens concatenate back to
    * their source words by construction). */
  def encodeCorpus(spark: SparkSession, dir: String,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0)).as("words"))
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        val toks = words.flatMap(w => encodeWord(w, merges))
        (id, toks.length.toLong, toks.distinct.length.toLong,
          toks.take(10).mkString(" "))
      }
      .toDF("doc_id", "n_tokens", "n_distinct", "tok_head")
  }

  // --- DuckDB oracle: the training loop UNROLLED (one CTE pair per merge
  // rank — pair counts + argmax, then a data-driven replace), so the
  // oracle retrains the identical tokenizer in pure SQL and replays
  // encoding with the merges AS DATA. ---

  private def trainCtes(numMerges: Int, maxWords: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""
      WITH wf AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents)
        GROUP BY word ORDER BY c DESC, word LIMIT $maxWords),
      s0 AS MATERIALIZED (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS st, c FROM wf)""")
    for (i <- 0 until numMerges) {
      sb.append(s""",
      p$i AS (SELECT unnest(list_transform(range(1, len(string_split(trim(st),' '))), j ->
          {'l': string_split(trim(st),' ')[j], 'r': string_split(trim(st),' ')[j+1]})) AS pair, c
        FROM s$i),
      m$i AS MATERIALIZED (SELECT pair.l AS l, pair.r AS r, CAST(SUM(c) AS BIGINT) AS cnt
        FROM p$i GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
      s${i + 1} AS MATERIALIZED (SELECT CASE WHEN m.l IS NULL THEN st
          ELSE replace(st, ' '||m.l||' '||m.r||' ', ' '||m.l||m.r||' ') END AS st, c
        FROM s$i LEFT JOIN m$i m ON TRUE)""")
    }
    sb.toString
  }

  private val numMerges = 12
  private val maxWords = 200

  val queries: Map[String, Q] = Map(

    // The learned merge table itself: rank, fused pair, and the pair's
    // corpus count at selection time. The oracle RETRAINS the tokenizer
    // in SQL (unrolled argmax/replace levels over the same top-200 word
    // histogram) — a wrong count weighting, tie-break, or replace scan
    // order diverges the merge sequence and hash-fails.
    "t12_bpe_train" -> Q(
      (s, d) => {
        import s.implicits._
        trainFromCorpus(s, d, numMerges, maxWords).toDF()
          .select(col("rank").cast("int").as("merge_rank"),
            col("left").as("lhs"), col("right").as("rhs"), col("cnt"))
          .orderBy("merge_rank")
      },
      Some(trainCtes(numMerges, maxWords) + "\n" +
        (0 until numMerges).map(i =>
          s"SELECT CAST($i AS INT) AS merge_rank, l AS lhs, r AS rhs, cnt FROM m$i")
          .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank"))),

    // Corpus tokenization with the trained merges: per-document token
    // count, distinct-token count, and the first ten tokens in stream
    // order. The oracle re-derives the merges (same CTEs) and re-encodes
    // every word with data-driven replaces in rank order.
    "t13_bpe_encode" -> Q(
      (s, d) => {
        val merges = trainFromCorpus(s, d, numMerges, maxWords)
        encodeCorpus(s, d, merges)
          .filter(col("n_tokens") > 0)
          .orderBy("doc_id")
      },
      Some(trainCtes(numMerges, maxWords) + s""",
      w AS (SELECT doc_id, generate_subscripts(words, 1) AS wi,
          unnest(words) AS word FROM
        (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS words
         FROM documents)),
      e0 AS (SELECT doc_id, wi,
        ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS st FROM w)""" +
        (0 until numMerges).map(i => s""",
      e${i + 1} AS (SELECT doc_id, wi,
        CASE WHEN m.l IS NULL THEN st
          ELSE replace(st, ' '||m.l||' '||m.r||' ', ' '||m.l||m.r||' ') END AS st
        FROM e$i LEFT JOIN m$i m ON TRUE)""").mkString + s""",
      tok AS (SELECT doc_id, wi, string_split(trim(st), ' ') AS toks
        FROM e$numMerges),
      flat AS (SELECT doc_id, wi, generate_subscripts(toks, 1) AS ti,
        unnest(toks) AS tok FROM tok)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
        array_to_string(list_slice(list(tok ORDER BY wi, ti), 1, 10), ' ')
          AS tok_head
      FROM flat GROUP BY doc_id ORDER BY doc_id"""))
  )
}
