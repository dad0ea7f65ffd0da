package graft.streaming

import graft.engine.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingest into a catalog table: each micro-batch
  * lands as one append snapshot through the same optimistic commit
  * protocol as batch writers, so concurrent batch and streaming writers
  * converge, and every epoch is time-travelable.
  *
  * Exactly-once across restarts: `foreachBatch` replays the last epoch
  * after a failure, so each commit stamps `streaming-query-id` /
  * `streaming-batch-id` into its snapshot summary, and a batch whose id
  * is ≤ the query's last committed id is skipped — idempotent re-commit
  * without a second storage system. The check scans snapshot summaries
  * on the driver: O(retained snapshots), nothing per row.
  *
  * Scale: the micro-batch append inherits the batch write path
  * (distributed parquet write, partition-spec routing, field-id
  * stamping); state for windowed/sessionized upstream operators shuffles
  * on its keys as usual. At 1000 executors the commit remains one
  * metadata swap per epoch.
  */
object TableStreams {

  private[streaming] val QueryIdKey = "streaming-query-id"
  private[streaming] val BatchIdKey = "streaming-batch-id"

  /** Highest batch id this query has committed to the table, if any. */
  private[streaming] def lastCommittedBatch(
      table: GraftTable, queryId: String): Option[Long] = {
    val snaps = table.metadata.snapshots.values
    val ids = snaps.flatMap(s =>
      if (s.summary.get(QueryIdKey).contains(queryId))
        s.summary.get(BatchIdKey).flatMap(_.toLongOption)
      else None)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Start a streaming append into `table`. The source DataFrame must
    * match the table schema by name. */
  def appendStream(
      source: DataFrame,
      table: GraftTable,
      checkpointDir: String,
      queryId: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!lastCommittedBatch(table, queryId).exists(_ >= batchId)) {
          table.append(batch,
            extraSummary = Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString))
        }
        ()
      }
      .start()
}
