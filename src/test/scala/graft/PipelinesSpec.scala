package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Models
import graft.pipelines.{DomainFixtures, GeoPipeline, ServingPipeline, TrainingPipeline}

/** E1/E2/E3 end-to-end pipeline compositions over the synthetic domain
  * fixtures (FIXTURES.md §B) — the reference's three entry points.
  */
class PipelinesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val nHours = 24 * 30 // one synthetic month

  test("E1 feature table: fan-out join multiplies rows; features populated") {
    val traffic = DomainFixtures.traffic(spark, nHours)
    val weather = DomainFixtures.weather(spark, nHours)
    val feat = TrainingPipeline.featureTable(traffic, weather)
    val n = feat.count()
    assert(n > 0)
    // fan-out: each traffic row matches 10 weather points (2/borough × 5)
    val tRows = traffic.dropDuplicates()
      .filter(col("Vol").try_cast("double").isNotNull).count()
    assert(n > tRows * 5, s"fanout missing: feat=$n traffic=$tRows")
    // event stripe present (heavy-snow window in the fixture)
    assert(feat.filter(col("is_event") === 1).count() > 0)
    // no nulls in any feature column after dropna
    TrainingPipeline.featureCols.foreach { c =>
      assert(feat.filter(col(c).isNull).count() == 0, s"nulls in $c")
    }
  }

  test("E1 window keying parity: borough-only == borough+SegmentID on a single-segment fixture") {
    // With exactly one segment per borough, per-segment windows see the
    // same partitions as per-borough windows — features must be
    // bit-identical. (At scale the segmented keying is the point: window
    // parallelism = borough × segment cardinality instead of 5.)
    val traffic = DomainFixtures.traffic(spark, 24 * 7)
      .withColumn("SegmentID", lit(0L))
    val weather = DomainFixtures.weather(spark, 24 * 7)
    val cols = Seq("RequestID", "borough", "date", "Vol",
      "vol_lag_1", "vol_roll_3", "vol_roll_24")
    val a = TrainingPipeline.featureTable(traffic, weather)
      .select(cols.map(col): _*)
    val b = TrainingPipeline.featureTable(traffic, weather,
        windowKeyCols = Seq("borough", "SegmentID"))
      .select(cols.map(col): _*)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("E1 chunked-window parity: daily chunks == plain borough window, bit-identical") {
    // The chunked evaluation (bounded-history replication) must produce
    // byte-identical features to the single-sort-per-borough window —
    // including across chunk boundaries, where the first 24 rows of each
    // chunk read replicated context.
    val traffic = DomainFixtures.traffic(spark, 24 * 7)
    val weather = DomainFixtures.weather(spark, 24 * 7)
    val cols = Seq("RequestID", "borough", "date", "Vol",
      "vol_lag_1", "vol_roll_3", "vol_roll_24")
    val a = TrainingPipeline.featureTable(traffic, weather)
      .select(cols.map(col): _*)
    val b = TrainingPipeline.featureTable(traffic, weather,
        chunkSpanHours = Some(24L))
      .select(cols.map(col): _*)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("chunked trailing: empty calendar gaps don't strand context; thin interior chunk rejected") {
    import graft.windows.TrailingFeatures
    // 3 bursts with a silent day between burst 2 and 3: context from the
    // last populated chunk must reach the NEXT POPULATED chunk, not the
    // empty calendar successor.
    val rows = ((0 until 60).map(i => (1L, i.toLong)) ++           // day 0 (minutes 0-59)
      (0 until 60).map(i => (1L, 1440L + i)) ++                    // day 1
      (0 until 60).map(i => (1L, 4320L + i)))                      // day 3 (day 2 empty)
      .zipWithIndex.map { case ((g, m), i) => (g, m, (i % 7).toDouble) }
    val df = rows.toDF("g", "minute", "v")
      .withColumn("ts", expr("timestampadd(MINUTE, minute, timestamp'2024-01-01 00:00:00')"))
    val chunk = floor(unix_micros(col("ts")) / (24L * 3600L * 1000000L))
    val plain = TrailingFeatures.withTrailing(df, "v", Seq("g"), Seq("ts"),
      lags = Seq(1), rolls = Seq(3, 24))
    val chunked = TrailingFeatures.withTrailingChunked(df, "v", Seq("g"), Seq("ts"),
      chunk, lags = Seq(1), rolls = Seq(3, 24))
    assert(plain.except(chunked).count() == 0 && chunked.except(plain).count() == 0)
    // a 10-row interior chunk can't carry 24 rows of history: validator throws
    val thin = ((0 until 60).map(i => (1L, i.toLong)) ++
      (0 until 10).map(i => (1L, 1440L + i)) ++
      (0 until 60).map(i => (1L, 2880L + i)))
      .zipWithIndex.map { case ((g, m), i) => (g, m, i.toDouble) }
      .toDF("g", "minute", "v")
      .withColumn("ts", expr("timestampadd(MINUTE, minute, timestamp'2024-01-01 00:00:00')"))
    val err = intercept[IllegalArgumentException] {
      TrailingFeatures.withTrailingChunked(thin, "v", Seq("g"), Seq("ts"),
        chunk, lags = Seq(1), rolls = Seq(3, 24))
    }
    assert(err.getMessage.contains("interior chunk"))
  }

  test("E1 run: segmented GBT trains and beats the trivial predictor") {
    val traffic = DomainFixtures.traffic(spark, nHours)
    val weather = DomainFixtures.weather(spark, nHours)
    val res = TrainingPipeline.run(spark, traffic, weather, gbtIter = 10)
    // synthetic Vol is arithmetic (id*37 % 400): not truly learnable to
    // high R2, but the pipeline must produce finite metrics and a model
    // that predicts positive volumes after expm1
    assert(!res.r2.isNaN && !res.mae.isNaN && !res.mape.isNaN)
    assert(res.mae > 0)
  }

  test("E2 serving: registry dispatch + single-row predict") {
    val df = (0 until 500).map { i =>
      val r = ServingPipeline.PredictRequest(
        math.sin(i), math.cos(i), math.sin(i / 7.0), math.cos(i / 7.0),
        math.sin(i / 12.0), math.cos(i / 12.0),
        (i % 50).toDouble, (i % 30).toDouble, (i % 20).toDouble)
      (r, math.log1p(2.0 * (i % 50) + (i % 30) + 1.0))
    }.toDF("req", "label").select(col("req.*"), col("label"))
    val cols = Seq("hour_sin", "hour_cos", "wd_sin", "wd_cos", "month_sin",
      "month_cos", "vol_lag_1", "vol_roll_3", "vol_roll_24")
    val model = Models.ols(cols, "label").fit(df)
    val reg = ServingPipeline.registry("linear" -> model)

    val pred = ServingPipeline.predict(spark, reg, "linear",
      ServingPipeline.PredictRequest(0.5, 0.5, 0.1, 0.9, 0.2, 0.8, 25.0, 15.0, 10.0),
      expm1Inverse = true)
    assert(pred > 0 && !pred.isNaN)
    assertThrows[NoSuchElementException] {
      ServingPipeline.predict(spark, reg, "nope",
        ServingPipeline.PredictRequest(0, 0, 0, 0, 0, 0, 0, 0, 0))
    }
  }

  test("E2 serving: local-vector fast path matches the DataFrame path exactly") {
    val df = (0 until 500).map { i =>
      val r = ServingPipeline.PredictRequest(
        math.sin(i), math.cos(i), math.sin(i / 7.0), math.cos(i / 7.0),
        math.sin(i / 12.0), math.cos(i / 12.0),
        (i % 50).toDouble, (i % 30).toDouble, (i % 20).toDouble)
      (r, math.log1p(2.0 * (i % 50) + (i % 30) + 1.0))
    }.toDF("req", "label").select(col("req.*"), col("label"))
    val cols = Seq("hour_sin", "hour_cos", "wd_sin", "wd_cos", "month_sin",
      "month_cos", "vol_lag_1", "vol_roll_3", "vol_roll_24")
    // linear AND a tree ensemble — the two model families the registry
    // actually serves; both must agree bit-for-bit with transform()
    val ols = Models.ols(cols, "label").fit(df)
    val gbt = Models.gbt(cols, "label", maxIter = 5, maxDepth = 3).fit(df)
    val reg = ServingPipeline.registry("linear" -> ols, "gbt" -> gbt)
    val reqs = Seq(
      ServingPipeline.PredictRequest(0.5, 0.5, 0.1, 0.9, 0.2, 0.8, 25.0, 15.0, 10.0),
      ServingPipeline.PredictRequest(-0.7, 0.3, 0.99, -0.1, 0.0, 1.0, 49.0, 29.0, 19.0),
      ServingPipeline.PredictRequest(0, 0, 0, 0, 0, 0, 0, 0, 0))
    for (name <- Seq("linear", "gbt"); req <- reqs; inv <- Seq(false, true)) {
      val viaDf = ServingPipeline.predict(spark, reg, name, req, inv)
      val local = ServingPipeline.predictLocal(reg, name, req, inv)
      assert(local == viaDf,
        s"$name local=$local df=$viaDf for $req expm1=$inv")
    }
    assertThrows[NoSuchElementException] {
      ServingPipeline.predictLocal(reg, "nope", reqs.head)
    }
  }

  test("E3 build + filter: WKT→lon/lat→Feature JSON; filter is case-insensitive, year-scoped") {
    val traffic = DomainFixtures.traffic(spark, nHours)
    val feats = GeoPipeline.buildFeatures(traffic).cache()
    try {
      // coordinates land in the NYC bbox
      val bad = feats.filter(col("lat") < 40.4 || col("lat") > 41.1 ||
        col("lon") < -74.5 || col("lon") > -73.4).count()
      assert(bad == 0)
      // feature JSON is well-formed GeoJSON
      val f = feats.select("feature").head().getString(0)
      assert(f.startsWith("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""))
      assert(f.contains(""""properties":{"RequestID":"""))
      // filter: case-insensitive borough + year
      val manhattan = GeoPipeline.filterFeatures(feats, "mAnHaTtAn", 2024).count()
      assert(manhattan > 0)
      assert(GeoPipeline.filterFeatures(feats, "manhattan", 1999).count() == 0)
      assert(GeoPipeline.filterFeatures(feats, "atlantis", 2024).count() == 0)
    } finally { feats.unpersist(); () }
  }

  test("E3 volume colors match the reference thresholds") {
    val got = Seq(25.0, 15.0, 7.0, 2.0).toDF("v")
      .select(GeoPipeline.volumeColor(col("v")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("red", "orange", "yellow", "green"))
  }

  test("corpus curation end-to-end: every stage drops exactly its own defect class") {
    val boiler = "subscribe to our newsletter for updates and offers" // 8 tokens = one span
    val evalText = "keep this secret eval passage away from training data at all costs"
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the old mill by the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs to the old mill by the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and runs to the old mill by the river bank today tonight"), // near-dup of 1
      (4L, "a completely different story of ships and seas is told in the harbor town every single morning"),
      (5L, s"$boiler the wizard tale begins here now"),
      (6L, s"$boiler another pirate saga starts tomorrow night friends"),
      (7L, s"it is said the $evalText story"), // contaminated vs eval set
      (8L, "lorem ipsum dolor sit amet consectetur"), // no markers → lang und
      (9L, "the end is near")) // < 5 tokens
      .toDF("doc_id", "text")
    val eval = Seq(Tuple1(evalText)).toDF("text")
    val out = graft.pipelines.CorpusPipeline.curate(docs, eval,
        packBudget = 16, shards = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // survivors: 1 (rep of {1,2,3}), 4, 5 (first owner of the boiler
    // span), 6 (boiler stripped, tail kept)
    assert(out.keySet == Set(1L, 4L, 5L, 6L), s"got ${out.keySet}")
    assert(out(1L)._2 == 20L)
    assert(out(5L)._2 == 14L) // 8 boiler + 6 tail, untouched
    assert(out(6L)._2 == 7L,  // boiler span removed, 7-token tail kept
      s"doc 6 tokens = ${out(6L)._2}")
    assert(out.values.forall(_._1 == "en"))
    // packing invariants: offset inside the budget, sequence ids start at 0
    assert(out.values.forall(v => v._5 >= 0 && v._5 < 16 && v._4 >= 0))
  }
}
