package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming counterparts of the batch operators: the same
  * declarative transforms applied to an unbounded `readStream` frame.
  * The reference has no streaming surface (SURVEY.md §2c) — these are
  * part of the training-pipeline extension: continuous ingestion dedup
  * and windowed quality monitoring.
  */
object StreamingOps {

  /** Exact streaming dedup on a fingerprint column: state-backed
    * `dropDuplicates` scoped by watermark so state is bounded (late
    * duplicates beyond the watermark are the at-least-once tradeoff). */
  def streamingExactDedup(
      stream: DataFrame, tsCol: String, fingerprintCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(fingerprintCol, tsCol)

  /** Tumbling-window per-type event counts with late-data handling. */
  def windowedEventCounts(
      stream: DataFrame, tsCol: String, typeCol: String,
      windowLen: String = "1 minute", watermark: String = "5 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n_events"))
}
