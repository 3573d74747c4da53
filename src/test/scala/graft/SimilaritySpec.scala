package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Embedding near-dup pair operators: the exact blocked path must equal a
  * naive all-pairs reference, and the approximate LSH path (the 100 TB
  * library default) is pinned by subset-of-exact precision plus a recall
  * bound on a synthetic near-identical corpus (the real fixture's max
  * pair cosine is 0.48 — no high-similarity pairs to measure recall on).
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact blocked near-dup pairs == naive all-pairs cross join (sf0.001)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = pairSet(
      Similarity.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.4))
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val naive = pairSet(v.select(col("vec_id").as("id_a"), col("v").as("va"))
      .crossJoin(v.select(col("vec_id").as("id_b"), col("v").as("vb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("c", Similarity.cosine(col("va"), col("vb")))
      .filter(col("c") >= 0.4)
      .select(col("id_a"), col("id_b")))
    assert(exact == naive, s"exact=${exact.size} naive=${naive.size}")
    assert(exact.nonEmpty)
  }

  test("LSH near-dup: subset of exact (precision 1.0) + recall bound on near-identical twins") {
    val dim = 64
    def base(i: Long): Array[Double] =
      Array.tabulate(dim)(d => math.sin(i * 37.0 + d * 1.7))
    // 100 base vectors, each with a near-identical twin (~0.01 relative
    // perturbation → cosine ≈ 0.99995, angle ≈ 0.6°)
    val rows = (0L until 100L).flatMap { i =>
      val v = base(i)
      val twin = v.zipWithIndex.map { case (x, d) => x + 0.01 * math.sin(i + d.toDouble) }
      Seq((i * 2, v), (i * 2 + 1, twin))
    }
    val df = rows.toDF("vec_id", "embedding")
    val thr = 0.98
    val exact = pairSet(
      Similarity.cosineNearDupPairsExact(df, "vec_id", "embedding", thr))
    val lsh = pairSet(
      Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding", thr,
        nPlanes = 8, dim = dim))
    // every LSH pair passes the same exact cosine filter → subset of exact
    assert(lsh.subsetOf(exact), s"LSH emitted non-exact pairs: ${lsh -- exact}")
    assert(exact.size >= 90, s"fixture broken: only ${exact.size} exact pairs")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8,
      s"recall=$recall (${lsh.size}/${exact.size}) — 8-plane sign-LSH should " +
        "catch near-identical twins")
  }
}
