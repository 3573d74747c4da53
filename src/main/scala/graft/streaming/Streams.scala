package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lineage.LineageOps
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming slice (SURVEY.md §2.7 T1-T3).
  *
  * The reference has no stream processor — its incremental patterns are a
  * chunked CSV loop (T1), a checkpointed REST-ingestion script with
  * per-response CSV appends (T2, scripts/enrich_weather.py:170-183), and
  * precomputed trailing features served point-in-time (T3,
  * main.py:278-310). Spark-first mappings:
  *
  *  - T1/T2 → file-source `readStream` + `foreachBatch` with a
  *    checkpointLocation: exactly-once incremental append without the
  *    hand-rolled progress log.
  *  - T3 → either windowed aggregation with a watermark, or
  *    `flatMapGroupsWithState` keeping a per-key trailing buffer — the
  *    online twin of the batch window in [[graft.windows.TrailingFeatures]].
  *
  * State scale: per-key state is O(window width) doubles; keys partition
  * across executors by hash — 100 M keys at w=24 is ~20 GB cluster-wide,
  * well within state-store territory (RocksDB-backed in production confs).
  */
object Streams {

  /** events.parquet schema under `nanosAsLong` (the test tables carry
    * TIMESTAMP(NANOS), which Spark reads as long when the legacy conf is
    * set — see [[graft.sources.Tables.events]]).
    */
  val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming scan of the documents table — the corpus-ingest source
    * for streaming curation (quality gates, language gates,
    * decontamination are all stateless predicates and apply unchanged;
    * see `Dedup.contaminationPredicate`).
    */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Streaming scan of the events table (file source, micro-batched).
    *
    * The file-source requires a user schema, and the events table's
    * parquet timestamp type has varied across driver testdata
    * generations (TIMESTAMP(NANOS) → long under `nanosAsLong`;
    * TIMESTAMP(MICROS) naive → TIMESTAMP_NTZ) — a hardcoded long
    * schema read µs-precision files as µs-valued "nanos" and shrank
    * every timestamp 1000×, collapsing event-time windows (caught by
    * the oracle as a 3385-row aggregate dropping to 10). Probe the
    * footer with a batch read (one driver-side metadata job at stream
    * definition) and normalize to TimestampType the same way
    * [[graft.sources.Tables.events]] does.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Same session-timezone pin as [[graft.sources.Tables.events]]: the
    // NTZ cast is only epoch-identical to the nanos path under UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Footer probe needs the file to exist; a stream defined over a
    // directory populated LATER (the production ingest shape) falls back
    // to a schema instead of throwing at definition time. The fallback
    // is NTZ — the CURRENT testdata generation — and deliberately NOT
    // the nanos/long schema: if nanos files later land under an NTZ
    // schema the read fails LOUDLY (parquet type mismatch), whereas a
    // long fallback would read µs files as "nanos" and silently shrink
    // every timestamp 1000× (the exact corruption the probe exists to
    // prevent; see the scaladoc above).
    val tsType =
      try spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      catch {
        case scala.util.control.NonFatal(_) => TimestampNTZType
      }
    val schema = StructType(eventsNanosSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // the table is a single file; the stream source needs a directory
      .parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** T3 (windowed): hourly per-type aggregate over a stream, with a
    * 1-hour watermark bounding state. Complete output mode so a single
    * AvailableNow pass over historical files yields the full result
    * (batch-equivalent semantics — oracle-checked in q_stream_hourly_agg).
    */
  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value after. A stateful stream's
    * state-store instance count is fixed from this conf at FIRST start
    * (and pinned by the checkpoint thereafter), and every instance pays
    * a per-micro-batch commit (delta file write + maintenance) that is
    * pure fixed cost — so state parallelism should track state-row
    * cardinality, not the session's batch-analytics shuffle width.
    * Measured at sf0.1 on local[32]: 32→8 instances cut the stateful
    * trailing stream 5.1→2.1 s and the near-dup ingest 3.7→2.3 s with
    * row-identical output. At ingest scale the same knob applies in
    * reverse: size it to keep per-instance state within executor memory.
    */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  def hourlyAggAvailableNow(spark: SparkSession, dir: String,
      queryName: String = "stream_hourly",
      statePartitions: Int = 8): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    spark.table(queryName)
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Streaming sessionization: the SAME `session_window` aggregate as
    * the batch operator (operators/Temporal.sessionize), run as a
    * Structured Streaming query — session merging happens inside the
    * streaming state store, so late events within a session's gap extend
    * it across micro-batches. Complete output + AvailableNow gives the
    * batch-equivalent full result for the oracle check; a production
    * deployment would use a watermark + Append and emit each session
    * once it can no longer grow.
    */
  def sessionizeAvailableNow(spark: SparkSession, dir: String,
      queryName: String = "stream_sessions",
      statePartitions: Int = 8): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("__sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    spark.table(queryName)
      .select(col("user_id"), col("__sw.start").as("session_start"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming drift monitor: per-event-time-window PSI of the live
    * `value` distribution against a STATIC reference — the
    * production-monitoring companion to [[graft.operators.Drift]]: the
    * batch detectors gate a data drop after the fact; this one watches
    * drift arrive window by window at ingest.
    *
    * The reference rides as LITERALS (`edges` = its quantile bin edges,
    * `refProps` = its per-bin mass — both O(nBins), computed once from
    * the reference corpus, e.g. via [[graft.operators.Drift.psiBins]]),
    * so the stream side is ONE windowed aggregate: binning is literal
    * column math and the per-bin counts are nBins conditional sums in a
    * single `agg` — Structured Streaming restricts chained streaming
    * aggregations, so the second level (summing PSI terms over bins)
    * is a pure PROJECTION over the nBins count columns, which is also
    * exactly the state-minimal shape: one row of nBins longs per open
    * window, nothing data-sized. Complete output + AvailableNow gives
    * the batch-equivalent full result (oracle-checked stream==batch in
    * q_stream_drift); a production deployment would use Update mode
    * and alert on `psi` crossing its threshold as windows close.
    */
  def driftMonitorAvailableNow(spark: SparkSession, dir: String,
      edges: Seq[Double], refProps: Seq[Double],
      windowDur: String = "1 day", eps: Double = 1e-6,
      queryName: String = "stream_drift",
      statePartitions: Int = 8): DataFrame = {
    require(refProps.length == edges.length + 1,
      "refProps must have edges.length + 1 bins")
    val nBins = refProps.length
    def binOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      edges.map(e => when(c > lit(e), 1L).otherwise(0L)).reduce(_ + _)
    val binned = eventsStream(spark, dir)
      .filter(col("value").isNotNull)
      .withWatermark("ts", "1 hour")
      .withColumn("__bin", binOf(col("value")))
    val aggs = (0 until nBins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val agg = binned.groupBy(window(col("ts"), windowDur).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    val n = (0 until nBins).map(i => col(s"__c$i")).reduce(_ + _)
    val psi = (0 until nBins).map { i =>
      val p = col(s"__c$i") / col("__n")
      (p - lit(refProps(i))) *
        log(greatest(p, lit(eps)) / lit(math.max(refProps(i), eps)))
    }.reduce(_ + _)
    spark.table(queryName)
      .withColumn("__n", n)
      .select(col("w.start").as("window_start"), col("__n").as("n"),
        psi.as("psi"))
  }

  /** Multi-FEATURE streaming drift monitor — the streaming face of
    * [[graft.operators.Drift.driftMatrix]] (round 16): per
    * (event-time window × feature) PSI against static per-feature
    * reference bins, in ONE streaming aggregate. Each feature carries
    * its own reference-derived edges and proportions as literals (the
    * same ride-along-the-plan contract as the single-column monitor —
    * chained streaming aggregates are restricted, so everything after
    * the windowed count is batch arithmetic on the bins-sized result):
    * the stream is melted map-side into (ts, feature, bin) — bin
    * computed per feature BEFORE the explode, so the generator emits
    * small ints, not values — and the one windowed groupBy(window,
    * feature, bin) count is the only stateful stage. State =
    * windows × features × bins longs; post-processing densifies
    * zero-count bins against the literal grid and folds the
    * eps-floored PSI terms per (window, feature).
    *
    * `features`: (name, column expr over the events schema, edges,
    * refProps) — null feature values drop that feature's row only
    * (the melt keeps the other features of the same event).
    */
  def driftMatrixMonitorAvailableNow(spark: SparkSession, dir: String,
      features: Seq[(String, org.apache.spark.sql.Column, Seq[Double], Seq[Double])],
      windowDur: String = "1 day", eps: Double = 1e-6,
      queryName: String = "stream_drift_matrix",
      statePartitions: Int = 8): DataFrame = {
    require(features.nonEmpty, "need >= 1 feature")
    features.foreach { case (n, _, edges, refProps) =>
      require(refProps.length == edges.length + 1,
        s"feature $n: refProps must have edges.length + 1 bins")
    }
    def binOf(c: org.apache.spark.sql.Column, edges: Seq[Double]) =
      edges.map(e => when(c > lit(e), 1L).otherwise(0L)).reduce(_ + _)
    val melted = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("ts"), explode(array(features.map { case (n, c, ed, _) =>
        struct(lit(n).as("f"),
          when(c.isNotNull, binOf(c.cast("double"), ed)).as("bin"))
      }: _*)).as("__fb"))
      .filter(col("__fb.bin").isNotNull)
      .select(col("ts"), col("__fb.f").as("__f"), col("__fb.bin").as("__bin"))
    val agg = melted
      .groupBy(window(col("ts"), windowDur).as("w"), col("__f"), col("__bin"))
      .agg(count(lit(1)).as("__c"))
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    // batch tail over the bins-sized memory table
    import spark.implicits._
    val dim = features.flatMap { case (n, _, _, rp) =>
      rp.zipWithIndex.map { case (p, i) => (n, i.toLong, p) }
    }.toDF("__f", "__bin", "__p")
    // bins-sized; checkpoint breaks the memory-table self-join lineage
    // (grid derives from counts) and drops the watermark metadata that
    // otherwise makes the join's reference dedup fail
    val counts = spark.table(queryName).graftCheckpoint()
    val grid = counts.select(col("w")).distinct().crossJoin(broadcast(dim))
    val dense = grid
      .join(counts, Seq("w", "__f", "__bin"), "left")
      .select(col("w"), col("__f"), col("__bin"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = dense.groupBy(col("w"), col("__f")).agg(sum(col("__c")).as("__n"))
    dense.join(tot, Seq("w", "__f"))
      .withColumn("__pc", col("__c").cast("double") / col("__n"))
      .withColumn("__t", (col("__pc") - col("__p")) *
        log(greatest(col("__pc"), lit(eps)) / greatest(col("__p"), lit(eps))))
      .groupBy(col("w"), col("__f"))
      .agg(max(col("__n")).as("n"), sum(col("__t")).as("psi"))
      .select(col("w.start").as("window_start"), col("__f").as("feature"),
        col("n"), col("psi"))
      // a feature with zero mass in a window has no defined PSI there
      .filter(col("n") > 0)
  }

  /** Windowed STREAMING data-quality gate — the streaming face of
    * [[graft.operators.Profiling.validate]] /
    * [[graft.operators.Expectations]] (round 16, completing the
    * monitoring triad: drift, drift matrix, quality): per event-time
    * window, every check's violation count in ONE streaming aggregate.
    * Checks are the SAME (name, violation-aggregate) pairs validate
    * takes (notNullViolations / rangeViolations / inSetViolations…), so
    * a pipeline declares its constraints once and runs them batch at
    * publish time and streaming at ingest time. State = one row of
    * longs per open window; the checks-sized melt to (window_start,
    * check, n_rows, violations, passed) happens batch-side on the
    * result table.
    */
  def qualityMonitorAvailableNow(spark: SparkSession, dir: String,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      windowDur: String = "1 day",
      queryName: String = "stream_quality",
      statePartitions: Int = 8): DataFrame = {
    require(checks.nonEmpty, "checks must be non-empty")
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case ((_, c), i) => coalesce(c.cast("long"), lit(0L)).as(s"__v$i") }
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    val stackArgs = lit(checks.length) +: checks.zipWithIndex.flatMap {
      case ((n, _), i) => Seq(lit(n), col(s"__v$i")) }
    spark.table(queryName)
      .select(col("w.start").as("window_start"), col("__n").as("n_rows"),
        stack(stackArgs: _*).as(Seq("check", "violations")))
      .withColumn("passed", col("violations") === 0)
      .select(col("window_start"), col("check"), col("n_rows"),
        col("violations"), col("passed"))
  }

  /** T4: stream-static enrichment at ingest — the streaming side joins
    * a small STATIC dimension (here a tier mapping) before aggregating.
    * Spark plans the static side as a broadcast against every
    * micro-batch, so enrichment costs no stream-side shuffle and no
    * state; only the post-enrichment aggregate keeps state. This is
    * the canonical "decorate events with reference data while
    * ingesting" shape; the oracle is the equivalent batch CASE
    * mapping, pinning stream≡batch row parity.
    */
  def enrichedAggAvailableNow(spark: SparkSession, dir: String,
      tiers: Seq[(String, String)],
      queryName: String = "stream_enriched",
      statePartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val dim = tiers.toDF("event_type", "tier")
    val agg = eventsStream(spark, dir)
      .join(broadcast(dim), Seq("event_type"), "left")
      .withColumn("tier", coalesce(col("tier"), lit("other")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("tier"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    withStatePartitions(spark, statePartitions) {
      val q = agg.writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    spark.table(queryName)
      .select(col("tier"), col("w.start").as("day"), col("n"),
        col("sum_value"))
  }

  /** T2: checkpointed incremental ingestion — every new source file lands
    * in `destDir` exactly once (the reference's requests-cache +
    * progress-log idempotence, enrich_weather.py:21-23,170-183).
    *
    * Exactly-once holds because the sink is IDEMPOTENT per micro-batch:
    * each batch overwrites its own `batch_id=<id>` subdirectory, so when
    * Structured Streaming replays the last batch after a failure (its
    * contract is at-least-once delivery to foreachBatch) the replay
    * replaces the identical data instead of appending a duplicate.
    * Downstream `spark.read.parquet(destDir)` sees `batch_id` as a
    * partition column.
    *
    * destDir LAYOUT CONTRACT: destDir must contain ONLY `batch_id=<id>`
    * subdirectories written by this ingester against the SAME checkpoint.
    * Two misuse modes are rejected up front rather than corrupting data:
    *  - destDir holding flat (non-partitioned) files breaks partition
    *    discovery for downstream readers;
    *  - a FRESH checkpoint over a non-empty destDir would restart batch
    *    ids at 0 and silently REPLACE previously ingested batches.
    */
  def ingestAvailableNow(spark: SparkSession, srcGlob: String,
      schema: StructType, destDir: String, checkpointDir: String,
      format: String = "parquet"): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val destPath = new org.apache.hadoop.fs.Path(destDir)
    val fs = destPath.getFileSystem(hconf)
    if (fs.exists(destPath)) {
      val entries = fs.listStatus(destPath)
        .filterNot(s => s.getPath.getName.startsWith("_") || s.getPath.getName.startsWith("."))
      val stray = entries.filterNot(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      require(stray.isEmpty,
        s"destDir $destDir contains non-batch_id entries (${stray.take(3).map(_.getPath.getName).mkString(", ")}); " +
          "the sink writes a batch_id=<id> partition layout and cannot mix with flat files")
      val ckptPath = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
      val ckptFs = ckptPath.getFileSystem(hconf)
      require(entries.isEmpty || ckptFs.exists(ckptPath),
        s"destDir $destDir already holds ingested batches but checkpoint $checkpointDir is fresh: " +
          "batch ids would restart at 0 and replace existing data; use the original checkpoint or a new destDir")
    }
    val q = spark.readStream.schema(schema).format(format).load(srcGlob)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$destDir/batch_id=$batchId"): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup — the streaming twin of [[graft.operators.Dedup.exact]]
    * for incremental corpus ingestion: a document re-delivered within the
    * watermark horizon (at-least-once sources re-send on retry/replay) is
    * dropped; exactly ONE delivery survives per id. (Across micro-batches
    * the earlier batch's row wins — state already exists; WITHIN a batch
    * the survivor among same-id rows is arbitrary, as
    * `dropDuplicatesWithinWatermark` gives no intra-batch ordering
    * guarantee.) State is BOUNDED by the watermark:
    * one key per id survives only until the event-time horizon passes, so
    * state size tracks the dedup window, never the corpus — the property
    * that makes this run forever at ingest scale. (Exact-forever dedup
    * belongs in the batch layer: `dropDuplicates` on a stream keeps
    * unbounded state.)
    */
  def dedupStream(df: DataFrame, idCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  // -- T3 (stateful): per-key trailing features online ---------------------

  case class Ev(k: String, t: Long, v: Double, id: Long = 0L)
  case class EvOut(k: String, t: Long, v: Double, id: Long,
    lag1: Option[Double], roll3: Option[Double])
  case class TrailState(recent: List[Double])

  /** Online lag-1 + trailing-exclusive 3-mean per key — the streaming twin
    * of TrailingFeatures (batch window A3/A4): at each row, features are
    * computed from the state BEFORE appending the row (frame [t-3, t-1]).
    * Rows within a micro-batch are folded in (t, id) order — the same
    * deterministic tie-break as the batch window, so on an in-order feed
    * the two are row-identical (oracle-checked by
    * q_stream_stateful_trailing).
    *
    * The rolling mean is summed oldest→newest to match the batch
    * accumulation order bit-for-bit.
    */
  def trailingOnline(ds: Dataset[Ev]): Dataset[EvOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[Ev], state: GroupState[TrailState]) => {
          var recent = state.getOption.map(_.recent).getOrElse(Nil) // newest first
          val out = rows.toSeq.sortBy(e => (e.t, e.id)).map { e =>
            val lag1 = recent.headOption
            val w = recent.take(3).reverse // oldest-first accumulation
            val roll3 = if (w.isEmpty) None else Some(w.sum / w.size)
            recent = (e.v :: recent).take(24)
            EvOut(key, e.t, e.v, e.id, lag1, roll3)
          }
          state.update(TrailState(recent))
          out.iterator
        })
  }

  /** q_stream_stateful_trailing: run [[trailingOnline]] over the events
    * table as a real stream (AvailableNow → memory sink) and return the
    * per-event features; on this in-order historical feed the result is
    * row-identical to the batch window functions (the oracle).
    */
  def statefulTrailingAvailableNow(spark: SparkSession, dir: String,
      queryName: String = "stream_stateful",
      statePartitions: Int = 8): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir)
      .select(col("user_id").cast("string").as("k"),
        unix_micros(col("ts")).as("t"), col("value").as("v"),
        col("event_id").as("id"))
      .as[Ev]
    withStatePartitions(spark, statePartitions) {
      val q = trailingOnline(ev).writeStream.format("memory")
        .queryName(queryName).outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      StreamMetrics.record(q)
    }
    spark.table(queryName)
  }

  // -- Streaming near-duplicate dedup at ingest (MinHash-LSH band state) ---

  /** One LSH band bucket touched by one document. `ts` is the document's
    * event time (ingest time in production; a constant for historical
    * corpora with no time column) — it drives the watermark that bounds
    * bucket state in [[nearDupFlags]].
    */
  case class BandRow(doc_id: Long, band: Int, band_hash: Long, n_bands: Int,
    ts: java.sql.Timestamp)
  /** Per-bucket state: event-time of the bucket's most recent claimant.
    * A bucket whose `lastTouchMs + horizon` has fallen behind the
    * watermark is EXPIRED — logically absent even if the physical
    * timeout has not fired yet (timeouts only fire for groups with no
    * data in the batch, so a re-touched stale bucket must be expired
    * in-function).
    */
  case class BucketState(lastTouchMs: Long)
  /** Per-(doc, bucket) claim verdict: `fresh` iff this doc is the
    * bucket's FIRST claimant ever (no prior batch, lowest doc id within
    * this batch).
    */
  case class BandFlag(doc_id: Long, fresh: Boolean, n_bands: Int)

  /** (doc, band, band_hash) rows for streaming (or batch) near-dup
    * dedup: MinHash signatures → LSH band buckets — all stateless
    * per-row expressions, so the SAME plan fragment runs under a
    * streaming source unchanged. A document too short to produce any
    * shingle gets a PRIVATE always-fresh bucket (band −1, keyed by its
    * own id) so it is always kept — the same contract as batch fuzzy
    * dedup, where a shingle-less doc pairs with nothing and survives.
    * The short-doc branch is a `when` over ONE band array (band hashes
    * computed exactly like `Dedup.lshBuckets`), not a union of two
    * filters — a union would evaluate the signature pipeline once per
    * branch, and checkpointing it away is a batch-only tool.
    *
    * `tsCol`: the event-time column carried into [[BandRow.ts]] (ingest
    * time in a live deployment). `None` — for historical corpora with no
    * time column — stamps every row with one constant timestamp, so the
    * watermark never advances and no bucket is ever evicted (the
    * pre-eviction behavior, appropriate for a bounded backfill).
    */
  def lshBandRows(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 12, rowsPerBand: Int = 2,
      tsCol: Option[String] = None): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val tsExpr = tsCol.map(col)
      .getOrElse(to_timestamp(lit("2020-01-01 00:00:00")))
    val sig = graft.operators.Dedup.withMinhash(
      docs.select(Seq(col(idCol), col(textCol)) ++
        tsCol.map(c => col(c)): _*), textCol, idCol, n, k)
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"),
        graft.functions.Hashing.h60(concat_ws("_", parts: _*)).as("band_hash"))
    }
    sig
      .select(col(idCol).as("doc_id"), tsExpr.as("ts"),
        explode(when(col("mh_0").isNull, // null iff the shingle set is empty
          array(struct(lit(-1).as("band"),
            col(idCol).cast("long").as("band_hash"))))
          .otherwise(array(bandStructs: _*))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.band_hash"), col("ts"))
      .withColumn("n_bands", when(col("band") === -1, 1).otherwise(nBands))
      .as[BandRow]
  }

  /** The stateful core of streaming near-dup dedup: one small state
    * record per LSH band bucket ("when was this bucket last claimed").
    * Rows within a bucket group fold in doc-id order, so the
    * batch-internal winner is deterministic (lowest id — the batch
    * operators' tie rule).
    *
    * The decision this enables is GREEDY FIRST-WINS: a doc is kept iff
    * every one of its band buckets is fresh, i.e. iff no earlier doc
    * (kept or dropped, this batch or any before) touched any of them.
    * That is the one-pass streaming counterpart of batch
    * LSH → connected components → lowest-id survivor; the two agree on
    * the common cases (a fresh doc, an exact/near copy of one kept doc)
    * and diverge only on chain topologies a single pass cannot see
    * (batch CC merges A–B, B–C into one cluster even when A∩C = ∅). The
    * streaming-side guarantee is still exactly what dedup-at-ingest
    * needs: NO TWO KEPT DOCS ARE LSH CANDIDATES of each other within
    * the state horizon.
    *
    * State is one `lastTouchMs` long per distinct bucket — 8-byte key +
    * timestamp, the smallest state the eviction contract permits — and
    * it is BOUNDED: the watermark on [[BandRow.ts]] drives
    * `EventTimeTimeout`, so a bucket untouched for `horizonMs` of event
    * time is physically dropped from the state store. State size tracks
    * the dedup horizon (buckets touched in the last `horizonMs`), never
    * the corpus — the same property [[dedupStream]] gets from
    * `dropDuplicatesWithinWatermark`. Because a timeout only fires for
    * groups with NO data in a batch, a stale bucket that IS re-touched
    * is expired in-function instead: state older than the horizon
    * relative to `getCurrentWatermarkMs` counts as absent, so both
    * eviction paths agree.
    *
    * Horizon semantics: a near-dup arriving MORE than
    * `horizonMs + latenessMs` of event time after its bucket's last
    * claimant is KEPT (the bucket was forgotten); one arriving within
    * `horizonMs` is dropped; in between, retention depends on how far
    * the watermark lags max event time — dedup-at-ingest trades
    * completeness-beyond-the-horizon for bounded state, exactly like
    * the exact-dedup sibling. `latenessMs` is the ALLOWED-LATENESS
    * bound (watermark delay): rows more than `latenessMs` of event
    * time behind the stream's max are dropped by the watermark before
    * they reach the state function. It is deliberately DECOUPLED from
    * the horizon — with `delay = horizonMs` (one knob for both) the
    * watermark lags by a full horizon and buckets survive up to
    * 2×`horizonMs`, silently dropping near-dups the contract says to
    * keep. With the constant-`ts` stamping of [[lshBandRows]]
    * (`tsCol = None`) the watermark never advances and nothing is ever
    * evicted — bounded backfills get full-corpus greedy semantics.
    */
  def nearDupFlags(bands: Dataset[BandRow],
      horizonMs: Long = 30L * 24 * 3600 * 1000,
      latenessMs: Long = 3600L * 1000): Dataset[BandFlag] = {
    import bands.sparkSession.implicits._
    bands
      .withWatermark("ts", s"$latenessMs milliseconds")
      .groupByKey(b => (b.band, b.band_hash))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val seen = state.getOption.exists(_.lastTouchMs + horizonMs >= wm)
            val rs = rows.toArray.sortBy(_.doc_id)
            val maxTs = rs.iterator.map(_.ts.getTime).max
            val touch = if (seen) math.max(state.get.lastTouchMs, maxTs) else maxTs
            state.update(BucketState(touch))
            // input rows are never below the watermark, so touch+horizon
            // is a valid (future) timeout timestamp
            state.setTimeoutTimestamp(touch + horizonMs)
            rs.iterator.zipWithIndex.map { case (r, i) =>
              BandFlag(r.doc_id, fresh = !seen && i == 0, r.n_bands)
            }
          }
        })
  }

  /** Per-batch kept-doc aggregation shared by the harness and sink
    * variants: a doc survives iff ALL its band flags are fresh. Every
    * band row of a doc rides the same input row, so the aggregation is
    * BATCH-LOCAL — cross-batch memory lives only in [[nearDupFlags]]'s
    * bucket state.
    */
  private def keptIds(batch: Dataset[BandFlag]): DataFrame =
    batch.groupBy(col("doc_id"), col("n_bands"))
      .agg(sum(when(col("fresh"), 1L).otherwise(0L)).as("n_fresh"))
      .filter(col("n_fresh") === col("n_bands"))
      .select(col("doc_id"))

  /** q_stream_neardup: near-duplicate dedup AT INGEST over the documents
    * table as a real stream — kept doc ids, one row per survivor.
    *
    * ORACLE-EQUIVALENCE ASSUMPTION: the greedy first-wins closed form in
    * the SQL oracle ranks claimants by doc id GLOBALLY, which matches
    * this query only when the AvailableNow file source delivers all docs
    * in ONE micro-batch (the fixture directory holds a single
    * `documents.parquet`, and no maxFilesPerTrigger is set, so it does).
    * With multiple batches, batch arrival order outranks id order and
    * the kept set is the (still candidate-pair-free) multi-batch greedy
    * set instead — the StreamingSpec fixture covers that path.
    *
    * The foreachBatch body collects kept ids for the harness (bounded:
    * survivors of one micro-batch); [[nearDupDedupToSink]] is the
    * production shape. The temp checkpoint is deleted on completion —
    * AvailableNow over a fixed directory is a one-shot run, not a
    * resumable ingest.
    */
  def nearDupDedupAvailableNow(spark: SparkSession, dir: String,
      n: Int = 3, k: Int = 12, rowsPerBand: Int = 2,
      statePartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val flags = nearDupFlags(
      lshBandRows(documentsStream(spark, dir), "text", "doc_id", n, k, rowsPerBand))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-neardup-ckpt")
    try withStatePartitions(spark, statePartitions) {
      val q = flags.writeStream.outputMode(OutputMode.Append())
        .queryName("q_stream_neardup_run")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: Dataset[BandFlag], _: Long) =>
          val ids = keptIds(batch).as[Long].collect()
          kept.synchronized { val _ = kept ++= ids }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      StreamMetrics.record(q)
    } finally deleteRecursively(ckpt)
    kept.toSeq.toDF("doc_id")
  }

  /** Production near-dup-dedup-at-ingest: kept doc ids land in
    * `destDir/batch_id=<id>` parquet, one idempotent overwrite per
    * micro-batch (the [[ingestAvailableNow]] exactly-once sink pattern),
    * against a CALLER-OWNED durable checkpoint so the ingest resumes
    * where it left off. `tsCol` should be the ingest-time column so
    * [[nearDupFlags]]'s horizon actually evicts; downstream joins the
    * kept-id table back to the raw corpus (or inlines the doc payload —
    * swap `keptIds` for a kept-rows projection).
    */
  def nearDupDedupToSink(docs: DataFrame, destDir: String,
      checkpointDir: String, textCol: String = "text",
      idCol: String = "doc_id", tsCol: Option[String] = None,
      n: Int = 3, k: Int = 12, rowsPerBand: Int = 2,
      horizonMs: Long = 30L * 24 * 3600 * 1000,
      latenessMs: Long = 3600L * 1000): Unit = {
    val flags = nearDupFlags(
      lshBandRows(docs, textCol, idCol, n, k, rowsPerBand, tsCol),
      horizonMs, latenessMs)
    val q = flags.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[BandFlag], batchId: Long) =>
        keptIds(batch).write.mode("overwrite")
          .parquet(s"$destDir/batch_id=$batchId"): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** T3 late-data ADMISSION certification (q_stream_late — VERDICT r12,
    * Next round #7): watermark late-drop semantics as a hash-checked
    * oracle row, not just a spec. A three-micro-batch file stream is
    * built from the events table:
    *
    *  - batch 0 — the RECENT slice (ts within `recentDays` of max; this
    *    batch carries the global max event time);
    *  - batch 1 — re-delivered copies of the `nRedelivered` newest
    *    recent rows (all dropped as duplicates: their batch-0 state is
    *    alive, their event time is above every watermark in play);
    *  - batch 2 — every older row (the stragglers).
    *
    * `maxFilesPerTrigger=1` with explicit file modification times pins
    * the batch boundaries. The three-batch shape matters because Spark
    * filters late events with the watermark LAGGED ONE BATCH behind the
    * eviction watermark (SPARK-40925 watermark propagation: batch N's
    * late filter uses the value persisted for batch N−1, i.e. computed
    * from data through batch N−2 — measured here: a 2-batch fixture
    * drops NOTHING because the stragglers' batch still late-filters at
    * wm=0). With the max in batch 0, batch 2's late filter stands
    * deterministically at floor-to-ms(max ts) − `lateness` (Spark
    * tracks event time in milliseconds), and the stragglers divide
    * exactly: ADMITTED iff ts ≥ watermark. The certified operator is
    * the watermarked streaming DEDUP (`dropDuplicates` with the event
    * time column in the key set — the form whose late-data contract is
    * defined), deliberately not a windowed aggregate: Append-mode dedup
    * emits admitted rows in their arrival batch, so the oracle only has
    * to restate the admission rule — no window-finalization timing to
    * replay. Defaults (2-day recent slice, 72 h lateness) make every
    * outcome non-vacuous on the 30-day events fixture: one day's worth
    * of stragglers is admitted late, everything older is dropped, and
    * the re-deliveries exercise the dedup path.
    *
    * Returns (event_id, event_type, ts_us, value) for the admitted set.
    */
  def lateAdmissionAvailableNow(spark: SparkSession, dir: String,
      recentDays: Int = 2, lateness: String = "72 hours",
      nRedelivered: Int = 10, statePartitions: Int = 8,
      queryName: String = "stream_late"): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .filter(col("ts").isNotNull)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // ms precision on purpose: the stream's watermark arithmetic is ms
    val cutoff =
      new java.sql.Timestamp(maxTs.getTime - recentDays * 86400000L)
    val recent = ev.filter(col("ts") >= lit(cutoff))
    val redelivered = recent.orderBy(col("event_id").desc).limit(nRedelivered)
    val stragglers = ev.filter(col("ts") < lit(cutoff))
    val root = java.nio.file.Files.createTempDirectory("graft_stream_late")
    try {
      val srcDir = root.resolve("src")
      java.nio.file.Files.createDirectories(srcDir)
      def writeBatchFile(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = root.resolve(s"tmp_$name")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for $name"))
        val dest = srcDir.resolve(s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        dest.toFile.setLastModified(mtime): Unit
      }
      val t0 = System.currentTimeMillis() - 300000L
      writeBatchFile(recent, "b0", t0)
      writeBatchFile(redelivered, "b1", t0 + 60000L)
      writeBatchFile(stragglers, "b2", t0 + 120000L)
      // dropDuplicates WITH the event-time column in the key set: that is
      // the form whose late-data contract is defined (rows below the
      // watermark are dropped before touching state). The horizon-bounded
      // [[dedupStream]] (dropDuplicatesWithinWatermark) deliberately does
      // NOT drop late rows — its state may already have expired, so it
      // admits them as new — which is exactly the wrong operator to
      // certify admission semantics on. Re-deliveries carry the original
      // (event_id, ts), so dedup still drops them.
      val admitted = spark.readStream.schema(recent.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .withWatermark("ts", lateness)
        .dropDuplicates("event_id", "ts")
      withStatePartitions(spark, statePartitions) {
        val q = admitted.writeStream.format("memory").queryName(queryName)
          .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        StreamMetrics.record(q)
      }
      spark.table(queryName)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        // the memory table dies with the session but the files don't —
        // materialize before the finally-block deletes the source dir
        .graftCheckpoint()
    } finally deleteRecursively(root)
  }

  /** Stream-stream event-time interval join with BOTH sides watermarked
    * (q_stream_stream_join — VERDICT r13, Next round #6: the one
    * Structured Streaming surface the inventory lacked; everything else
    * stops at stream-static enrichment).
    *
    * Fixture: the left stream is the events table; the right stream is
    * a derived ack stream — one ack per event, `ack_ts = ts +
    * (event_id % ackModSeconds) seconds` — so ground truth is
    * restatable in batch SQL with no randomness. The join is the
    * canonical interval form: equal ids, ack within [ts, ts +
    * matchWindow), with `ackModSeconds ≤ matchWindow` so every
    * co-admitted pair matches.
    *
    * Three pinned micro-batches per side (same mtime trick as
    * [[lateAdmissionAvailableNow]]; two source directories, each under
    * `maxFilesPerTrigger=1`, advance in lockstep):
    *
    *  - batch 0 — left: the recent slice (carries the global max event
    *    time); right: recent acks EXCEPT the held-back subset
    *    (`event_id % holdbackMod == 0`);
    *  - batch 1 — left: an empty file (pure batch-boundary spacer);
    *    right: the held-back acks — these must pair against LEFT STATE
    *    from batch 0, certifying the cross-batch buffered-state path
    *    (the thing a within-batch join never exercises);
    *  - batch 2 — left: the stragglers; right: their acks. The late
    *    filter here stands at the batch-0 watermark (SPARK-40925
    *    one-batch lag, as in [[lateAdmissionAvailableNow]]):
    *    `min(floor_ms(max left ts in b0), floor_ms(max right ack in
    *    b0)) − lateness` — the min because the default multi-watermark
    *    policy takes the lagging side. A straggler pair survives iff
    *    its LEFT time is admitted (`ts ≥ wm` ⇒ `ack_ts ≥ wm` since the
    *    delta is non-negative; an ack whose event was dropped finds no
    *    partner — inner-join semantics).
    *
    * Recent left state is never evicted mid-run: eviction needs
    * `ts + matchWindow < wm`, and the recent slice sits `recentDays`
    * (< lateness) above the watermark by construction — so the batch-1
    * holdback pairs are deterministic, not a race against cleanup.
    *
    * Returns (event_id, event_type, ts_us, ack_us, value) for the
    * admitted pairs. State scale: per-side state is bounded by
    * lateness × arrival rate and evicted by watermark — the standard
    * production contract; nothing here is fixture-only except the
    * batch pinning.
    */
  def streamStreamJoinAvailableNow(spark: SparkSession, dir: String,
      recentDays: Int = 2, lateness: String = "72 hours",
      ackModSeconds: Int = 600, matchWindowSeconds: Int = 600,
      holdbackMod: Int = 20, statePartitions: Int = 8,
      queryName: String = "stream_stream_join"): DataFrame = {
    require(ackModSeconds <= matchWindowSeconds,
      "every ack must fall inside the join window")
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .filter(col("ts").isNotNull)
    val withAck = ev.withColumn("ack_ts",
      timestamp_add("SECOND", col("event_id") % ackModSeconds, col("ts")))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val cutoff =
      new java.sql.Timestamp(maxTs.getTime - recentDays * 86400000L)
    val leftCols = Seq(col("event_id"), col("event_type"), col("ts"),
      col("value"))
    val rightCols = Seq(col("event_id").as("ack_id"), col("ack_ts"))
    val recent = withAck.filter(col("ts") >= lit(cutoff))
    val stragglers = withAck.filter(col("ts") < lit(cutoff))
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj")
    try {
      val srcL = root.resolve("left"); val srcR = root.resolve("right")
      java.nio.file.Files.createDirectories(srcL)
      java.nio.file.Files.createDirectories(srcR)
      def writeBatchFile(df: DataFrame, dest: java.nio.file.Path,
          name: String, mtime: Long): Unit = {
        val tmp = root.resolve(s"tmp_${dest.getFileName}_$name")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for $name"))
        val out = dest.resolve(s"$name.parquet")
        java.nio.file.Files.move(part.toPath, out)
        out.toFile.setLastModified(mtime): Unit
      }
      val t0 = System.currentTimeMillis() - 300000L
      val holdback = col("ack_id") % holdbackMod === 0
      writeBatchFile(recent.select(leftCols: _*), srcL, "b0", t0)
      writeBatchFile(recent.select(leftCols: _*).limit(0), srcL, "b1",
        t0 + 60000L)
      writeBatchFile(stragglers.select(leftCols: _*), srcL, "b2",
        t0 + 120000L)
      writeBatchFile(recent.select(rightCols: _*).filter(!holdback),
        srcR, "b0", t0)
      writeBatchFile(recent.select(rightCols: _*).filter(holdback),
        srcR, "b1", t0 + 60000L)
      writeBatchFile(stragglers.select(rightCols: _*), srcR, "b2",
        t0 + 120000L)
      val leftSchema = recent.select(leftCols: _*).schema
      val rightSchema = recent.select(rightCols: _*).schema
      val left = spark.readStream.schema(leftSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcL.toString)
        .withWatermark("ts", lateness)
      val right = spark.readStream.schema(rightSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcR.toString)
        .withWatermark("ack_ts", lateness)
      val joined = left.join(right,
        col("event_id") === col("ack_id") &&
          col("ack_ts") >= col("ts") &&
          col("ack_ts") < col("ts") +
            expr(s"INTERVAL $matchWindowSeconds SECONDS"))
      withStatePartitions(spark, statePartitions) {
        val q = joined.writeStream.format("memory").queryName(queryName)
          .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        StreamMetrics.record(q)
      }
      spark.table(queryName)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("ack_ts")).as("ack_us"), col("value"))
        // materialize before the finally-block deletes the source dirs
        .graftCheckpoint()
    } finally deleteRecursively(root)
  }

  /** Best-effort recursive delete for harness-scoped temp dirs. */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    try {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f): Unit)
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
