package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import TestSession._
  import operators.Similarity

  private lazy val e = Tables.t(spark, sf, "embeddings")
  private lazy val centroids = e.filter(col("vec_id") < 8)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
  private lazy val corpus = e.filter(col("vec_id") >= 8 && col("vec_id") =!= 42)
  private lazy val qv = e.filter(col("vec_id") === 42)
    .select(col("embedding").as("qv"))

  test("IVF with nprobe = all centroids equals brute force") {
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", centroids)
    val ivf = Similarity.ivfSearch(assigned, "vec_id", "embedding",
      centroids, qv, nprobe = 8, k = 20).collect()
    val brute = corpus.crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(20).collect()
    assert(ivf.sameElements(brute))
  }

  test("IVF assignment covers the corpus exactly once") {
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", centroids)
    assert(assigned.count() == corpus.count())
    assert(assigned.select("vec_id").distinct().count() == corpus.count())
  }

  test("IVF nprobe=2 returns results from probed buckets only") {
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", centroids)
    val res = Similarity.ivfSearch(assigned, "vec_id", "embedding",
      centroids, qv, nprobe = 2, k = 20)
    assert(res.count() > 0)
    // every result id must be assigned to one of the 2 probed buckets
    val probed = centroids.crossJoin(broadcast(qv))
      .select(col("centroid_id"),
        Similarity.cosine(col("centroid"), col("qv")).as("qc"))
      .orderBy(col("qc").desc).limit(2)
      .collect().map(_.getLong(0)).toSet
    val resBuckets = res.join(assigned, "vec_id")
      .select("centroid_id").distinct().collect().map(_.getLong(0)).toSet
    assert(resBuckets.subsetOf(probed))
  }

  test("product quantization: 8-byte codes, deterministic, useful recall") {
    val e = Tables.t(TestSession.spark, TestSession.sf, "embeddings")
    val all = e.select(col("vec_id"), col("embedding"))
    val corpus = all.filter(col("vec_id") =!= 3)
    val qv = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val (cb, enc) = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16)
    // 64 floats → 8 code ids, each within [0, k)
    val codes = enc.select(explode(col("codes")).as("c"))
    assert(enc.select(size(col("codes"))).distinct().head.getInt(0) == 8)
    assert(codes.filter(col("c") < 0 || col("c") >= 16).count() == 0)
    // codebooks: 8 subspaces × ≤16 centroids of width 8
    assert(cb.select("subspace").distinct().count() == 8)
    assert(cb.select(size(col("centroid"))).distinct().head.getInt(0) == 8)
    // ADC search on i.i.d. random vectors — PQ's worst case (no structure
    // to exploit): pin a calibrated recall floor and the score correlation;
    // the pipeline is deterministic so the numbers are stable run-to-run
    val pqTop = Similarity.pqSearch(cb, enc, "vec_id", qv, m = 8, topK = 50)
      .collect().map(_.getLong(0))
    assert(pqTop.toSeq == Similarity.pqSearch(cb, enc, "vec_id", qv, m = 8,
      topK = 50).collect().map(_.getLong(0)).toSeq) // deterministic
    val ips = corpus.crossJoin(broadcast(qv))
      .select(col("vec_id"), Similarity.dot(col("embedding"), col("qv")).as("ip"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactTop10 = ips.toSeq.sortBy(-_._2).take(10).map(_._1)
    assert(exactTop10.count(pqTop.toSet.contains) >= 4,
      s"recall floor broken: $exactTop10 vs ${pqTop.toSeq}")
    // ADC scores correlate with true dots: PQ's picks beat the corpus mean
    val meanAll = ips.values.sum / ips.size
    val meanPq = pqTop.map(ips).sum / pqTop.length
    assert(meanPq > meanAll, s"$meanPq !> $meanAll")
  }

  test("product quantization is EXACT on codebook-grid data") {
    import TestSession.spark.implicits._
    // every subvector is one of 4 prototypes → zero quantization error →
    // ADC scores ARE the true dots and PQ top-k equals exact top-k
    val protos = Seq(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f), Array(0f, -1f))
    // diagonal first: the 4 smallest ids seed all 4 prototypes per subspace
    val pairs = (0 until 4).map(i => (i, i)) ++
      (for (a <- 0 until 4; b <- 0 until 4 if a != b) yield (a, b))
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, protos(a) ++ protos(b))
    }
    val grid = rows.toDF("vec_id", "embedding")
    val (cb, enc) = Similarity.pqTrain(grid, "vec_id", "embedding", m = 2, k = 4)
    val qv = Seq(Tuple1(Array(0.5f, 0.2f, 0.1f, 0.9f))).toDF("qv")
    val pq = Similarity.pqSearch(cb, enc, "vec_id", qv, m = 2, topK = 5)
      .collect().map(_.getLong(0)).toSeq
    val exact = grid.crossJoin(broadcast(qv))
      .select(col("vec_id"), Similarity.dot(col("embedding"), col("qv")).as("ip"))
      .orderBy(col("ip").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(pq == exact, s"pq=$pq exact=$exact")
  }

  test("MIPS augmentation ranks by inner product where cosine disagrees") {
    import TestSession.spark.implicits._
    // vs q=(1,0): a=(2,0) has cos 1.0 / ip 2; b=(5,1) has cos<1 / ip 5.
    // cosine ranks a first, inner product ranks b first.
    val pts = Seq((1L, Array(2.0f, 0.0f)), (2L, Array(5.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qv")
    val m = pts.agg(max(Similarity.l2norm(col("embedding"))).as("m"))
    val ranked = pts.crossJoin(broadcast(m)).crossJoin(broadcast(q))
      .withColumn("aug_cos", Similarity.dot(col("embedding"), col("qv")) /
        (col("m") * Similarity.l2norm(col("qv"))))
      .orderBy(col("aug_cos").desc)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(2L, 1L)) // inner-product order, not cosine order
  }

  test("kmeansFit recovers well-separated cluster means") {
    import TestSession.spark.implicits._
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.95f, 0.05f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.9f)), (12L, Array(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val init = pts.filter(col("vec_id").isin(0L, 10L))
      .select((col("vec_id") / 10).cast("int").as("centroid_id"),
        col("embedding").as("centroid"))
    val fitted = Similarity.kmeansFit(pts, "vec_id", "embedding", init, iters = 3)
    val cents = fitted.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // converged centroids are the exact per-cluster coordinate means
    assert(math.abs(cents(0)(0) - 0.95) < 1e-6 && math.abs(cents(0)(1) - 0.05) < 1e-6)
    assert(math.abs(cents(1)(0) - 0.05) < 1e-6 && math.abs(cents(1)(1) - 0.95) < 1e-6)
  }

  test("kmeansFit with zero iterations returns the init centroids") {
    import TestSession.spark.implicits._
    val pts = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val init = pts.select(lit(7).as("centroid_id"), col("embedding").as("centroid"))
    val out = Similarity.kmeansFit(pts, "vec_id", "embedding", init, iters = 0)
      .collect()
    assert(out.length == 1 && out.head.getInt(0) == 7 &&
      out.head.getSeq[Double](1) == Seq(1.0, 2.0))
  }
}
