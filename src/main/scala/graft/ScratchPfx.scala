package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.TextOps

/** Throwaway prefix-join stage profile (deleted before commit). */
object ScratchPfx {
  def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("scratchpfx").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val threshold = 0.8
    for (rep <- 1 to 2) {
      val df = graft.sources.Tables.documents(spark, dir, widen = true)
      val t1 = timeS {
        val shingled = df
          .withColumn("__toks", TextOps.tokens(col("text")))
          .withColumn("__hts", transform(col("__toks"), t => Hashing.h60(t)))
          .select(col("doc_id"),
            array_distinct(TextOps.shingleHashesFromTokenHashes(col("__hts"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint(true)
        val t2 = timeS {
          val inv = shingled.select(col("doc_id"), explode(col("sh")).as("sh_h"))
          val freq = inv.groupBy("sh_h").agg(count(lit(1)).as("__f"))
            .localCheckpoint(true)
          println(s"  freq rows=${freq.count()}")
        }
        println(f"  t2_freq=$t2%.2f")
        val inv = shingled.select(col("doc_id"), explode(col("sh")).as("sh_h"))
        val freq = inv.groupBy("sh_h").agg(count(lit(1)).as("__f"))
        val t3 = timeS {
          val prefixed = inv.join(freq, "sh_h")
            .groupBy(col("doc_id"))
            .agg(array_sort(collect_list(struct(col("__f"), col("sh_h")))).as("__ss"))
            .select(col("doc_id"),
              slice(transform(col("__ss"), s => s.getField("sh_h")), lit(1),
                (size(col("__ss")) - ceil(lit(threshold) * size(col("__ss"))) + 1)
                  .cast("int")).as("__pref"))
          println(s"  prefixed=${prefixed.count()}")
        }
        println(f"  t3_prefix=$t3%.2f")
        val prefixed = inv.join(freq, "sh_h")
          .groupBy(col("doc_id"))
          .agg(array_sort(collect_list(struct(col("__f"), col("sh_h")))).as("__ss"))
          .select(col("doc_id"),
            slice(transform(col("__ss"), s => s.getField("sh_h")), lit(1),
              (size(col("__ss")) - ceil(lit(threshold) * size(col("__ss"))) + 1)
                .cast("int")).as("__pref"))
          .localCheckpoint(true)
        val t4 = timeS {
          val cands = prefixed
            .select(col("doc_id").as("id"), explode(col("__pref")).as("sh_h"))
            .groupBy("sh_h")
            .agg(sort_array(collect_list(col("id"))).as("ids"))
            .filter(size(col("ids")) > 1)
            .select(col("ids"), posexplode(col("ids")).as(Seq("p", "id_a")))
            .select(col("id_a"),
              explode(slice(col("ids"), col("p") + lit(2), size(col("ids")))).as("id_b"))
            .distinct()
          println(s"  cands=${cands.count()}")
        }
        println(f"  t4_cands=$t4%.2f")
      }
      println(f"rep=$rep total_shingle_plus=$t1%.2f")
    }
    spark.stop()
  }
}
