package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver bench contract: run the query inventory on SPARK_GRAFT_SF_DIR
  * at local[N], print ONE JSON line with per-query seconds.
  *
  * Also runs the E1 flagship — the reference's full training-feature
  * pipeline (fan-out join → calendar/holiday/trailing-window features →
  * dropna → aggregate) on synthetic domain data at the reference's scale
  * (~1.7 M traffic rows × ~10 weather points/hour ≈ 17 M joined rows;
  * BASELINE.md "Our bench target"). Scaled down via SPARK_GRAFT_E1_ROWS
  * for smoke runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // E1 flagship at reference scale: ~1.7M traffic rows (42,500 hours ×
    // 40 rows/hour), ~10 weather samples/hour fan-out ≈ 17M joined rows
    // through the full feature plan, reduced to a per-borough/event
    // aggregate (fit excluded — model training is benched by q_ols_coeffs).
    val e1Rows = sys.env.getOrElse("SPARK_GRAFT_E1_ROWS", "1700000").toLong
    val rowsPerHour = 40
    val nHours = math.max(1L, e1Rows / rowsPerHour).toInt
    val tE1 = System.nanoTime()
    val e1JoinedRows =
      try {
        val traffic = pipelines.DomainFixtures.traffic(spark, nHours, rowsPerHour)
        val weather = pipelines.DomainFixtures.weather(spark, nHours)
        val feat = pipelines.TrainingPipeline.featureTable(traffic, weather)
        // ONE execution: the aggregate's counts also give the row total
        val agg = feat.groupBy("borough", "is_event")
          .agg(count(lit(1)).as("n"), avg("Vol").as("avg_vol"),
            avg("vol_roll_24").as("avg_roll_24"))
          .collect()
        agg.map(_.getAs[Long]("n")).sum
      } catch { case _: Throwable => -1L }
    val e1Sec = (System.nanoTime() - tE1) / 1e9

    val qs = (results.toSeq :+ ("flagship_e1" -> e1Sec))
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum + e1Sec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","e1_rows":$e1JoinedRows}""")
    spark.stop()
  }
}
