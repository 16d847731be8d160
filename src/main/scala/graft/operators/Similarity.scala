package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over embedding vectors (array<float> column).
  *
  * Reference analogue: Presto's cosine_similarity(map,map) scalar
  * (presto-main/src/main/java/com/facebook/presto/operator/scalar/
  * MathFunctions.java) — here over dense arrays, plus the search operators a
  * training-data pipeline needs:
  *   - brute-force top-k: one map stage + TakeOrderedAndProject (exact
  *     baseline; scales as a single pass, no shuffle of the corpus);
  *   - LSH-bucketed ANN: deterministic random-hyperplane signatures; the
  *     probe only scans matching buckets — the 100 TB path where the corpus
  *     is pre-bucketed and bucket IDs partition-prune the scan.
  *
  * All dot products are double-accumulated `aggregate`/`zip_with` expression
  * trees (codegen'd, sequential over 64 dims → bit-identical to the oracle).
  */
object Similarity {

  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** dot(a, b) accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Sign bit of a deterministic pseudo-random hyperplane: weight for
    * (plane p, dim i) = ±1 from the parity of md5("p:i"). */
  private def planeSign(p: Column, i: Column): Column =
    when(conv(substring(md5(concat(p.cast("string"), lit(":"), i.cast("string"))
      .cast("binary")), 32, 1), 16, 10).cast("int") % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket id: bit-vector of hyperplane signs of the embedding. */
  def lshBucket(v: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p =>
        when(aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * planeSign(p, i)),
          lit(0.0), (acc, x) => acc + x) > 0,
          pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Multi-table LSH: `tables` independent bucket ids (table t draws its
    * hyperplanes from global plane indices t·planes … t·planes+planes−1),
    * the banding construction for hyperplane LSH — candidate recall is
    * 1−(1−p^planes)^tables instead of a single table's p^planes. Returns
    * an array; posexplode it and self-join on (table, bucket). At corpus
    * scale `planes` must grow with log₂(n) to keep buckets O(1)-sized. */
  def lshBuckets(v: Column, planes: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      aggregate(
        transform(sequence(lit(0), lit(planes - 1)), p =>
          when(aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
            (x, i) => x.cast("double") * planeSign(t * lit(planes) + p, i)),
            lit(0.0), (acc, x) => acc + x) > 0,
            pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x))

  /** Library API: exact top-k by cosine against a 1-row query-vector frame
    * (broadcast; single corpus pass + TakeOrderedAndProject). */
  def cosineTopK(corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, query: org.apache.spark.sql.DataFrame, qCol: String,
      k: Int): org.apache.spark.sql.DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(col(idCol), cosine(col(vecCol), col(qCol)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** IVF (inverted-file) ANN:
    *   - index: assign every vector to its nearest centroid (one broadcast
    *     pass; the bucket column partition-prunes at scale);
    *   - search: score only vectors in the `nprobe` centroids nearest the
    *     query, then exact cosine top-k within those buckets.
    * With nprobe = |centroids| this is EXACTLY brute force (spec-checked);
    * smaller nprobe trades recall for scanning 1/K of the corpus.
    */
  def ivfAssign(corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, centroids: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // argmax by (cos desc, centroid_id asc) as max-of-struct: a partial+
    // final hash aggregate instead of a per-vector window sort — at corpus
    // scale the assignment is one map-side-combined shuffle, no sort.
    val joined = corpus.crossJoin(broadcast(
      centroids.select(col("centroid_id"), col("centroid"))))
      .withColumn("c_cos", cosine(col(vecCol), col("centroid")))
    val others = corpus.columns.filterNot(_ == idCol)
    joined
      .groupBy(col(idCol))
      .agg(max(struct(col("c_cos"), (-col("centroid_id")).as("neg_cid"),
        struct(others.map(col): _*).as("rest"))).as("best"))
      .select(col(idCol) +: (-col("best.neg_cid")).as("centroid_id") +:
        others.map(n => col(s"best.rest.$n").as(n)): _*)
  }

  /** Library API: Lloyd's k-means over an embedding column — the centroid
    * TRAINER for the IVF index (`ivfAssign`/`ivfSearch` consume the result).
    *
    * Each iteration = one broadcast assign pass (`ivfAssign`, cosine
    * nearest with (cos desc, centroid_id) tie-break) + one element-wise
    * mean: posexplode to (centroid, dim) cells, partial+final avg — the
    * shuffle carries k×dim cells regardless of corpus size. Centroids stay
    * a k-row DataFrame, `localCheckpoint`ed per round so lineage is O(1)
    * in the iteration count (same discipline as
    * `Dedup.connectedComponents`). Deterministic given a deterministic
    * `init`; empty clusters drop (standard Lloyd collapse — seed with
    * distinct vectors to avoid). */
  def kmeansFit(corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, init: org.apache.spark.sql.DataFrame,
      iters: Int): org.apache.spark.sql.DataFrame = {
    var cents = init.select(col("centroid_id"),
      transform(col("centroid"), x => x.cast("double")).as("centroid"))
    for (_ <- 1 to iters) {
      cents = ivfAssign(corpus.select(col(idCol), col(vecCol)),
          idCol, vecCol, cents)
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("i", "x")))
        .groupBy(col("centroid_id"), col("i"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Batch IVF search: per-query top-k for a whole QUERY TABLE in one
    * plan — probe selection is a windowed top-nprobe per query over the
    * (tiny) query×centroid cross, and the corpus is touched once, joined
    * against the broadcast probe set. The retrieval shape batch curation
    * jobs run (N queries against one index), not N sequential searches. */
  def ivfSearchBatch(assigned: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, centroids: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, qidCol: String, qvCol: String,
      nprobe: Int, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probeW = Window.partitionBy(qidCol)
      .orderBy(col("qc").desc, col("centroid_id"))
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("qc", cosine(col("centroid"), col(qvCol)))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select(col(qidCol), col("centroid_id"), col(qvCol))
    val scoreW = Window.partitionBy(qidCol)
      .orderBy(col("cos_sim").desc, col(idCol))
    assigned
      .join(broadcast(probed), "centroid_id")
      .select(col(qidCol), col(idCol),
        round(cosine(col(vecCol), col(qvCol)), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(scoreW))
      .filter(col("rnk") <= k)
      .select(col(qidCol), col(idCol), col("cos_sim"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Product quantization (PQ): split the vector into `m` subvectors and
    * k-means-train a `k`-codeword codebook per subspace (`kmeansFit` —
    * each subspace trains independently). A vector encodes to `m` small
    * code ids (m·log2 k bits instead of dim·32 — e.g. 64 floats → 8
    * bytes), and asymmetric-distance (ADC) scoring approximates
    * dot(query, x) as Σ_s lut_s[code_s] where lut_s[c] = dot(query_s,
    * codeword_c): the per-query lookup tables are m·k doubles, broadcast,
    * so scoring the corpus is a map over the tiny code columns — the
    * memory-bound regime where PQ beats raw vectors at billion scale.
    *
    * Returns (codebooks, encoded): codebooks = (subspace, centroid_id,
    * centroid), encoded = (idCol, codes array<int>). */
  def pqTrain(corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int,
      iters: Int = 2): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val w = dim / m
    def sub(s: Int, c: Column): Column = slice(c, s * w + 1, w)
    val codebooks = (0 until m).map { s =>
      val sliced = corpus.select(col(idCol), sub(s, col(vecCol)).as("v"))
      // deterministic seeds: the k smallest-id subvectors (k rows — the
      // single-partition window is trivial)
      val win = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
      val init = sliced.orderBy(idCol).limit(k)
        .select((row_number().over(win) - 1).cast("int").as("centroid_id"),
          col("v").as("centroid"))
      kmeansFit(sliced, idCol, "v", init, iters)
        .select(lit(s).as("subspace"), col("centroid_id"), col("centroid"))
    }.reduce(_ union _).localCheckpoint(true)
    val encoded = (0 until m).foldLeft(
      corpus.select(col(idCol), col(vecCol))) { (acc, s) =>
      val cb = codebooks.filter(col("subspace") === s)
        .select(col("centroid_id"), col("centroid"))
      ivfAssign(acc.withColumn("_sub", sub(s, col(vecCol))),
        idCol, "_sub", cb)
        .withColumnRenamed("centroid_id", s"_c$s").drop("_sub")
    }
    val enc = encoded.select(col(idCol),
      array((0 until m).map(s => col(s"_c$s").cast("int")): _*).as("codes"))
    (codebooks, enc)
  }

  /** ADC top-k: score = Σ over subspaces of dot(query_sub, codeword). */
  def pqSearch(codebooks: org.apache.spark.sql.DataFrame,
      encoded: org.apache.spark.sql.DataFrame, idCol: String,
      queryVec: org.apache.spark.sql.DataFrame, m: Int,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val dim = codebooks.select(size(col("centroid"))).head.getInt(0) * m
    val w = dim / m
    // per-query lookup tables: (subspace, centroid_id) -> dot(query_s, c)
    val lut = codebooks.crossJoin(broadcast(queryVec))
      .select(col("subspace"), col("centroid_id").cast("int").as("code"),
        dot(col("centroid"),
          slice(col("qv"), col("subspace") * w + 1, lit(w))).as("score"))
    val lutMap = broadcast(lut.groupBy("subspace")
      .agg(map_from_entries(collect_list(struct(col("code"), col("score"))))
        .as("lut")))
    // one generate + join on the broadcast luts; scoring never touches
    // the original vectors
    encoded
      .select(col(idCol), posexplode(col("codes")).as(Seq("subspace", "code")))
      .join(lutMap, "subspace")
      .select(col(idCol), element_at(col("lut"), col("code")).as("s"))
      .groupBy(idCol).agg(sum(col("s")).as("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol))
      .limit(topK)
  }

  def ivfSearch(assigned: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, centroids: org.apache.spark.sql.DataFrame,
      queryVec: org.apache.spark.sql.DataFrame, nprobe: Int,
      k: Int): org.apache.spark.sql.DataFrame = {
    val probed = centroids.crossJoin(broadcast(queryVec))
      .select(col("centroid_id"), cosine(col("centroid"), col("qv")).as("qc"))
      .orderBy(col("qc").desc, col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    assigned
      .join(broadcast(probed), "centroid_id")
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  val queries: Map[String, Q] = Map(

    // Brute-force cosine top-k against a query vector (vec_id = 0):
    // exact ANN baseline. Plan: broadcast 1-row query side, map cosine,
    // TakeOrderedAndProject — no corpus shuffle.
    "s01_cosine_topk" -> Q(
      (s, d) => {
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        emb(s, d).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("label"),
            round(cosine(col("embedding"), col("qv")), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(20)
      },
      Some("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
          round(
            list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
            AS cos_sim
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id LIMIT 20""")),

    // Pairwise cosine stats per label pair on a slice — the all-pairs
    // verification shape (exact, oracle-checked).
    "s02_cosine_pairs" -> Q(
      (s, d) => {
        val a = emb(s, d).filter(col("vec_id") < 60)
          .select(col("vec_id").as("id_a"), col("label").as("la"), col("embedding").as("ea"))
        val b = emb(s, d).filter(col("vec_id") < 60)
          .select(col("vec_id").as("id_b"), col("label").as("lb"), col("embedding").as("eb"))
        a.join(b, col("id_a") < col("id_b"))
          .groupBy(col("la"), col("lb"))
          .agg(round(avg(cosine(col("ea"), col("eb"))), 6).as("avg_cos"),
            count(lit(1)).as("n_pairs"))
          .orderBy("la", "lb")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 60),
        pairs AS (
          SELECT a.label AS la, b.label AS lb,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT la, lb, round(avg(cos), 6) AS avg_cos, count(*) AS n_pairs
        FROM pairs GROUP BY la, lb ORDER BY la, lb""")),

    // LSH-bucketed ANN: deterministic hyperplane signatures (plane weights =
    // ±1 from md5 parity — reproducible in ANY engine with md5, which is
    // exactly why the construction avoids engine-native hashing); candidates
    // = same bucket as the query (8 planes → 256 buckets). The oracle
    // recomputes the signatures + bucket join exhaustively.
    "s03_ann_lsh" -> Q(
      (s, d) => {
        val bucketed = emb(s, d)
          .select(col("vec_id"), col("label"), col("embedding"),
            lshBucket(col("embedding"), 8).as("bucket"))
        val q = bucketed.filter(col("vec_id") === 0)
          .select(col("bucket").as("qbucket"), col("embedding").as("qv"))
        bucketed.filter(col("vec_id") =!= 0)
          .join(broadcast(q), col("bucket") === col("qbucket"))
          .select(col("vec_id"), col("label"), col("bucket"),
            round(cosine(col("embedding"), col("qv")), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(20)
      },
      Some("""
        WITH b AS (
          SELECT vec_id, label, embedding,
            CAST(list_sum(list_transform(range(0, 8), p ->
              CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), i ->
                  CAST(embedding[i] AS DOUBLE) *
                  (CASE WHEN ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
                      CAST(i - 1 AS VARCHAR)), 32, 1))::INT % 2 = 0
                    THEN 1.0 ELSE -1.0 END))) > 0
                THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS bucket
          FROM embeddings),
        q AS (SELECT bucket AS qbucket, embedding AS qv FROM b WHERE vec_id = 0)
        SELECT vec_id, label, bucket,
          round(
            list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
            AS cos_sim
        FROM b, q WHERE vec_id <> 0 AND bucket = qbucket
        ORDER BY cos_sim DESC, vec_id LIMIT 20""")),

    // IVF ANN search: 8 seed centroids, probe the 2 nearest buckets. The
    // whole pipeline (assign → probe → score) is deterministic arithmetic,
    // so the oracle replays it exhaustively in SQL; SimilaritySpec
    // additionally proves nprobe=all == brute force.
    "s05_ann_ivf" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val centroids = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
        val corpus = e.filter(col("vec_id") >= 8 && col("vec_id") =!= 42)
        val qv = e.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
        val assigned = ivfAssign(corpus, "vec_id", "embedding", centroids)
        ivfSearch(assigned, "vec_id", "embedding", centroids, qv,
          nprobe = 2, k = 20)
      },
      Some("""
        WITH c AS (SELECT vec_id AS centroid_id, embedding AS centroid
                   FROM embeddings WHERE vec_id < 8),
        corpus AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id >= 8 AND vec_id <> 42),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
        ac AS (
          SELECT v.vec_id, v.embedding, c.centroid_id,
            list_sum(list_transform(range(1, len(v.embedding) + 1),
              i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(c.centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS ccos
          FROM corpus v CROSS JOIN c),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rn
            FROM ac) WHERE rn = 1),
        probed AS (
          SELECT centroid_id FROM c CROSS JOIN q
          ORDER BY
            list_sum(list_transform(range(1, len(centroid) + 1),
              i -> CAST(centroid[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
            centroid_id
          LIMIT 2)
        SELECT a.vec_id,
          round(
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
            AS cos_sim
        FROM assigned a JOIN probed USING (centroid_id) CROSS JOIN q
        ORDER BY cos_sim DESC, vec_id LIMIT 20""")),

    // Distributed k-means (Lloyd) centroid training for the IVF index:
    // 2 iterations from 4 seed centroids, then a final assignment. Every
    // stage is deterministic arithmetic ((cos desc, centroid_id)
    // tie-breaks), so the oracle unrolls both iterations declaratively
    // (QUALIFY row_number for the argmax, lateral-unnest + list(ORDER BY)
    // for the element-wise means). The oracle's assignment score drops the
    // |v| factor (argmax-equivalent); output is per-cluster size + centroid
    // component-sum — a fingerprint of the exact trained centroids.
    "s07_kmeans_ivf" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val corpus = e.select(col("vec_id"), col("embedding"))
        val init = corpus.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("centroid_id"),
            col("embedding").as("centroid"))
        val fitted = kmeansFit(corpus, "vec_id", "embedding", init, iters = 2)
        val counts = ivfAssign(corpus, "vec_id", "embedding", fitted)
          .groupBy("centroid_id")
          .agg(count(lit(1)).cast("long").as("n_assigned"))
        fitted.join(counts, Seq("centroid_id"))
          .select(col("centroid_id"), col("n_assigned"),
            round(aggregate(col("centroid"), lit(0.0), (a, x) => a + x), 4)
              .as("centroid_sum"))
          .orderBy("centroid_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        c0 AS (SELECT CAST(vec_id AS INT) AS centroid_id, v AS c
               FROM e WHERE vec_id < 4),
        a1 AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c0.centroid_id,
              list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * c0.c[i])) /
                sqrt(list_sum(list_transform(c0.c, x -> x*x))) AS cs
            FROM e CROSS JOIN c0)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, centroid_id) = 1),
        c1 AS (
          SELECT centroid_id, list(m ORDER BY i) AS c FROM (
            SELECT a1.centroid_id AS centroid_id, t.i AS i, avg(e.v[t.i]) AS m
            FROM a1 JOIN e USING (vec_id), unnest(range(1, len(e.v)+1)) AS t(i)
            GROUP BY a1.centroid_id, t.i)
          GROUP BY centroid_id),
        a2 AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c1.centroid_id,
              list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * c1.c[i])) /
                sqrt(list_sum(list_transform(c1.c, x -> x*x))) AS cs
            FROM e CROSS JOIN c1)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, centroid_id) = 1),
        c2 AS (
          SELECT centroid_id, list(m ORDER BY i) AS c FROM (
            SELECT a2.centroid_id AS centroid_id, t.i AS i, avg(e.v[t.i]) AS m
            FROM a2 JOIN e USING (vec_id), unnest(range(1, len(e.v)+1)) AS t(i)
            GROUP BY a2.centroid_id, t.i)
          GROUP BY centroid_id),
        a3 AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c2.centroid_id,
              list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * c2.c[i])) /
                sqrt(list_sum(list_transform(c2.c, x -> x*x))) AS cs
            FROM e CROSS JOIN c2)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, centroid_id) = 1)
        SELECT c2.centroid_id, n.n_assigned, round(list_sum(c2.c), 4) AS centroid_sum
        FROM c2 JOIN (
          SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_assigned
          FROM a3 GROUP BY centroid_id) n USING (centroid_id)
        ORDER BY centroid_id""")),

    // Batch ANN: 5 query vectors against the IVF index in ONE plan (probe
    // top-2 buckets per query, score only those buckets, top-5 per query).
    // Deterministic arithmetic throughout, so the oracle replays assign →
    // per-query probe → per-query rank declaratively (QUALIFY windows).
    "s09_ann_batch" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val centroids = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
        val corpus = e.filter(col("vec_id") >= 8 && col("vec_id") < 495)
        val queries = e.filter(col("vec_id") >= 495)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val assigned = ivfAssign(corpus, "vec_id", "embedding", centroids)
        ivfSearchBatch(assigned, "vec_id", "embedding", centroids,
          queries, "q_id", "qv", nprobe = 2, k = 5)
          .orderBy("q_id", "rnk")
      },
      Some("""
        WITH c AS (SELECT vec_id AS centroid_id, embedding AS centroid
                   FROM embeddings WHERE vec_id < 8),
        corpus AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id >= 8 AND vec_id < 495),
        q AS (SELECT vec_id AS q_id, embedding AS qv
              FROM embeddings WHERE vec_id >= 495),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT v.vec_id, v.embedding, c.centroid_id,
              list_sum(list_transform(range(1, len(v.embedding) + 1),
                i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))) /
              (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
               sqrt(list_sum(list_transform(c.centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS ccos
            FROM corpus v CROSS JOIN c)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) = 1),
        probed AS (
          SELECT q_id, centroid_id, qv FROM (
            SELECT q.q_id, c.centroid_id, q.qv,
              list_sum(list_transform(range(1, len(c.centroid) + 1),
                i -> CAST(c.centroid[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) /
              (sqrt(list_sum(list_transform(c.centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
               sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS qc
            FROM q CROSS JOIN c)
          QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY qc DESC, centroid_id) <= 2)
        SELECT q_id, vec_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
          SELECT p.q_id, a.vec_id,
            round(
              list_sum(list_transform(range(1, len(a.embedding) + 1),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE))) /
              (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
               sqrt(list_sum(list_transform(p.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim,
            row_number() OVER (PARTITION BY p.q_id ORDER BY
              round(
                list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE))) /
                (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                 sqrt(list_sum(list_transform(p.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) DESC,
              a.vec_id) AS rnk
          FROM assigned a JOIN probed p USING (centroid_id))
        WHERE rnk <= 5
        ORDER BY q_id, rnk""")),

    // Maximum-inner-product search (MIPS) via norm augmentation: append
    // sqrt(M² − |x|²) to each corpus vector and 0 to the query — cosine
    // order on the augmented vectors IS inner-product order on the
    // originals (|x̂| = M constant, dot unchanged), so any cosine-ANN
    // index (LSH/IVF above) serves MIPS unchanged. The query RANKS through
    // the augmented-cosine path and OUTPUTS raw inner products; the oracle
    // computes plain dot top-k directly — a mismatch would mean the
    // reduction broke the order.
    "s08_mips" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val corpus = e.filter(col("vec_id") =!= 7)
          .select(col("vec_id"), col("embedding"))
        val qv = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
        val maxNorm = corpus.agg(max(l2norm(col("embedding"))).as("m"))
        val scored = corpus.crossJoin(broadcast(maxNorm))
          .crossJoin(broadcast(qv))
          .withColumn("ip", dot(col("embedding"), col("qv")))
          // augmented cosine: dot is unchanged (extra query dim is 0) and
          // |x̂| = m, so cos = ip / (m·|q|) — strictly increasing in ip
          .withColumn("aug_cos",
            col("ip") / (col("m") * l2norm(col("qv"))))
        scored
          .orderBy(col("aug_cos").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("ip"), 6).as("inner_product"))
      },
      Some("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
        scored AS (
          SELECT e.vec_id,
            list_sum(list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS ip
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 7)
        SELECT vec_id, round(ip, 6) AS inner_product
        FROM scored ORDER BY ip DESC, vec_id LIMIT 10""")),

    // Int8 quantization + integer-dot-product search — the compressed
    // similarity path (4× smaller vectors; integer dots are exact, so the
    // whole query hash-matches). Per-vector symmetric scale m = max |x|.
    "s06_quantized_ann" -> Q(
      (s, d) => {
        val qz = emb(s, d)
          .select(col("vec_id"), col("embedding"),
            expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
              .as("m"))
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(round(cast(x as double) / m * 127) as int))")
              .as("qv"))
        val q0 = qz.filter(col("vec_id") === 0).select(col("qv").as("q0"))
        qz.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id"), expr("""
            aggregate(zip_with(qv, q0, (a, b) -> cast(a as bigint) * cast(b as bigint)),
              cast(0 as bigint), (acc, x) -> acc + x)""").as("dotq"))
          .orderBy(col("dotq").desc, col("vec_id")).limit(10)
      },
      Some("""
        WITH qz AS (
          SELECT vec_id,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) / m * 127) AS INT)) AS qv
          FROM (
            SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
            FROM embeddings)),
        q0 AS (SELECT qv AS q0 FROM qz WHERE vec_id = 0)
        SELECT vec_id,
          CAST(list_sum(list_transform(range(1, len(qv) + 1),
            i -> CAST(qv[i] AS BIGINT) * CAST(q0[i] AS BIGINT))) AS BIGINT) AS dotq
        FROM qz, q0 WHERE vec_id <> 0
        ORDER BY dotq DESC, vec_id LIMIT 10""")),

    // Vector arithmetic surface: norms, scalar ops, centroid per label.
    "s04_vector_ops" -> Q(
      (s, d) => emb(s, d)
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          round(avg(l2norm(col("embedding"))), 6).as("avg_norm"),
          round(avg(dot(col("embedding"), col("embedding"))), 6).as("avg_sq"),
          round(min(element_at(col("embedding"), 1).cast("double")), 6).as("min_d0"),
          round(max(element_at(col("embedding"), 1).cast("double")), 6).as("max_d0"))
        .orderBy("label"),
      Some("""
        SELECT label, count(*) AS n,
          round(avg(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_norm,
          round(avg(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS avg_sq,
          round(min(CAST(embedding[1] AS DOUBLE)), 6) AS min_d0,
          round(max(CAST(embedding[1] AS DOUBLE)), 6) AS max_d0
        FROM embeddings GROUP BY label ORDER BY label"""))
  )
}
