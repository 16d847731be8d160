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
