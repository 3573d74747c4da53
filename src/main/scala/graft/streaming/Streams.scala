package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Streaming scan of the events table (file source, micro-batched). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsNanosSchema)
      .option("pathGlobFilter", "events.parquet") // the table is a single file; the stream source needs a directory
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** T3 (windowed): hourly per-type aggregate over a stream, with a
    * 1-hour watermark bounding state. Complete output mode so a single
    * AvailableNow pass over historical files yields the full result
    * (batch-equivalent semantics — oracle-checked in q_stream_hourly_agg).
    */
  def hourlyAggAvailableNow(spark: SparkSession, dir: String,
      queryName: String = "stream_hourly"): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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
      queryName: String = "stream_sessions"): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("__sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .select(col("user_id"), col("__sw.start").as("session_start"),
        col("n_events"), col("sum_value"))
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
      queryName: String = "stream_stateful"): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir)
      .select(col("user_id").cast("string").as("k"),
        unix_micros(col("ts")).as("t"), col("value").as("v"),
        col("event_id").as("id"))
      .as[Ev]
    val q = trailingOnline(ev).writeStream.format("memory")
      .queryName(queryName).outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
