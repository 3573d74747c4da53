package graft

import org.apache.spark.sql.SparkSession

/** State-store A/B for the heaviest stateful-streaming lanes (VERDICT
  * r15 #7): q_stream_stream_join (double-watermarked interval join —
  * the slowest non-flagship suite row, per-side state bounded by
  * lateness × arrival rate) and q_stream_late (late-data admission)
  * under the default HDFS-backed in-heap store vs RocksDB
  * (`RocksDBStateStoreProvider`, bundled with Spark 4). The r9 neardup
  * A/B showed the store choice matters at sf1 state sizes; this pins
  * the same decision for the r13-r15 join/late lanes with a committed
  * artifact instead of an assumption.
  *
  * The provider conf is read at STREAM START, so flipping it on the
  * shared session between lanes is a clean A/B (each lane starts its
  * own AvailableNow query). Run via
  * `sbt "Test/runMain graft.BenchStateStoreAb"`; output committed as
  * BENCH_statestore_ab.json.
  */
object BenchStateStoreAb {
  private def f3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SortThroughProject.install(spark)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val lanes = Seq("q_stream_stream_join", "q_stream_late",
      "q_stream_sessionize", "q_stream_stateful_trailing")
    val reps = 3
    def releasePersisted(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s((s.length - 1) / 2)
    }

    val results = Seq(("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1"))
      .flatMap { case (dir, tag) =>
        Seq(("heap", None), ("rocksdb", Some(rocks))).map { case (store, conf) =>
          conf match {
            case Some(v) => spark.conf.set(providerKey, v)
            case None    => spark.conf.unset(providerKey)
          }
          val times = lanes.map { lane =>
            val raw = (1 to reps).map { _ =>
              releasePersisted()
              System.gc()
              val t0 = System.nanoTime()
              SparkEntry.queries(lane)(spark, dir)
                .write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            lane -> (median(raw), raw)
          }
          (tag, store, times)
        }
      }
    val json = results.map { case (tag, store, times) =>
      val qs = times.map { case (l, (med, raw)) =>
        s""""$l":{"median":${f3(med)},"raw":${raw.map(f3).mkString("[", ",", "]")}}"""
      }.mkString(",")
      s"""{"sf":"$tag","store":"$store",$qs}"""
    }.mkString("[", ",", "]")
    val line = s"""{"metric":"statestore_ab","reps":$reps,"lanes":$json}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_statestore_ab.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
