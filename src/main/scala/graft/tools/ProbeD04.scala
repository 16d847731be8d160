package graft.tools
import graft._
import org.apache.spark.sql.functions._
/** Scratch: stage-level timing of d04 verify variants at a given fixture. */
object ProbeD04 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.t(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.3f s  (n=$n)")
    }
    val sh = docs.select(col("doc_id"), operators.Dedup.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(operators.Dedup.shinglesOf(col("t"), 3)).as("sh"))
      .localCheckpoint(true)
    sh.count()
    val cand = operators.Dedup.minhashLshPairsFromShingles(sh, "doc_id", "sh")
      .localCheckpoint(true)
    cand.count()
    for (_ <- 1 to 2) time("verify base") {
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_distinct(concat(col("sha"), col("shb"))))).as("j"))
        .filter(col("j") >= 0.8).count()
    }
    for (_ <- 1 to 2) time("verify sizes") {
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sha"), col("shb"))).as("i"),
          size(col("sha")).as("na"), size(col("shb")).as("nb"))
        .select(col("id_a"), col("id_b"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("j"))
        .filter(col("j") >= 0.8).count()
    }
    val shh = sh.select(col("doc_id"),
        array_distinct(transform(col("sh"), s => xxhash64(s))).as("sh"))
      .localCheckpoint(true)
    shh.count()
    for (_ <- 1 to 2) time("verify hashed+sizes") {
      cand
        .join(shh.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(shh.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sha"), col("shb"))).as("i"),
          size(col("sha")).as("na"), size(col("shb")).as("nb"))
        .select(col("id_a"), col("id_b"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("j"))
        .filter(col("j") >= 0.8).count()
    }
    spark.stop()
  }
}
