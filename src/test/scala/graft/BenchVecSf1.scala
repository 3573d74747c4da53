package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextOps}
import graft.sources.Tables

/** Round-11 scaling datapoints for the new vector operators at one
  * decade up (sf0.1 → locally generated sf1, tools/gen_sf1_*.py):
  * feature-hashing vectorization (map-only — must be ~linear),
  * spherical k-means (2 iterations — per-iteration cost is one pass +
  * one bounded aggregate), and the text→vector→ANN bridge (hashed
  * vectors feeding brute cosine top-k). Run via
  * `sbt "Test/runMain graft.BenchVecSf1"`; output committed as
  * BENCH_vec_sf1.json.
  */
object BenchVecSf1 {
  private def timeS[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }
  private def f3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 2
    val results = Seq(
      ("/root/testdata/sf0.1", "/root/testdata/sf0.1", "sf0.1"),
      ("/tmp/sf1", "/tmp/sf1", "sf1")).map { case (docDir, embDir, tag) =>
      val runs = (1 to reps).map { _ =>
        val docs = Tables.documents(spark, docDir, widen = true)
        val emb = Tables.embeddings(spark, embDir, widen = true)
        val nDocs = docs.count()
        val nVecs = emb.count()
        // map-only hashing-trick vectorization, forced via noop
        val (tHash, _) = timeS {
          TextOps.hashedVectors(docs, "text", "doc_id", dim = 256)
            .write.format("noop").mode("overwrite").save()
        }
        // 2-iteration spherical k-means from label-mean init
        val (tKm, kOut) = timeS {
          val init = Similarity.labelCentroids(emb, "embedding", "label")
          val cents = Similarity.kmeansFit(emb, "embedding", init, iters = 2)
          (cents.length,
            Similarity.kmeansAssign(emb, "vec_id", "embedding", cents).count())
        }
        // text → normalized hashed vectors → exact cosine top-5
        val (tBridge, bridgeRows) = timeS {
          val v = TextOps.hashedVectors(docs, "text", "doc_id",
            dim = 256, normalize = true)
          Similarity.bruteTopK(v, v.filter(col("doc_id") < 10),
            "doc_id", "embedding", 5).count()
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (nDocs, nVecs, tHash, tKm, kOut, tBridge, bridgeRows)
      }
      val best = runs.minBy(r => r._3 + r._4 + r._6)
      val (nDocs, nVecs, tHash, tKm, (k, assigned), tBridge, bridgeRows) = best
      s""""$tag":{"n_docs":$nDocs,"n_vecs":$nVecs,"hash_vec_sec":${f3(tHash)},""" +
        s""""kmeans_sec":${f3(tKm)},"kmeans_k":$k,"kmeans_assigned":$assigned,""" +
        s""""bridge_topk_sec":${f3(tBridge)},"bridge_rows":$bridgeRows}"""
    }
    println(s"""{"metric":"vec_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
