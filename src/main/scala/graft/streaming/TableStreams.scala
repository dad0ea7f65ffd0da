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
  * after a failure, so each commit persists the query's high-water mark
  * (`streaming.<queryId>.last-batch-id`) in the TABLE PROPERTIES of the
  * SAME commit as the append — a batch whose id is ≤ the mark is
  * skipped, idempotently, without a second storage system. Properties
  * survive `expire_snapshots` (snapshot summaries don't — an expired
  * snapshot must not resurrect its epoch on replay); summaries still
  * carry the ids for observability and as the legacy fallback.
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

  private[streaming] def hwmKey(queryId: String): String =
    s"streaming.$queryId.last-batch-id"

  /** Highest batch id this query has committed to the table, if any:
    * the durable property high-water mark first, snapshot summaries as
    * the legacy fallback (pre-HWM tables). */
  private[streaming] def lastCommittedBatch(
      table: GraftTable, queryId: String): Option[Long] = {
    val m = table.metadata
    m.properties.get(hwmKey(queryId)).flatMap(_.toLongOption).orElse {
      val ids = m.snapshots.values.flatMap(s =>
        if (s.summary.get(QueryIdKey).contains(queryId))
          s.summary.get(BatchIdKey).flatMap(_.toLongOption)
        else None)
      if (ids.isEmpty) None else Some(ids.max)
    }
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
            extraSummary = Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString),
            extraProperties = Map(hwmKey(queryId) -> batchId.toString))
        }
        ()
      }
      .start()

  /** CONTINUOUS materialized-view maintenance: a readStream on the MV's
    * source table drives one [[graft.engine.GraftMaterializedViews
    * .refresh]] tick per micro-batch — the MV stays current as data
    * arrives, without any scheduler.
    *
    * The micro-batch CONTENT is deliberately ignored: the stream is
    * only the "source advanced" signal. Refresh reads the source's
    * changelog itself under its OWN exactly-once checkpoint (committed
    * atomically with the MV content), so the composition needs zero
    * coordination between the two progress trackers — an at-least-once
    * foreachBatch replay re-invokes refresh, which observes the
    * checkpoint already at the head and no-ops; a missed signal is
    * caught by the next batch's tick, which folds BOTH commits'
    * changes in one churn-priced pass. */
  def materializedViewStream(
      spark: org.apache.spark.sql.SparkSession,
      catalog: graft.engine.GraftSparkCatalog,
      catalogName: String,
      sourceIdent: graft.catalog.TableIdent,
      mvIdent: graft.catalog.TableIdent,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      // signal-only consumer: deletes/overwrites on the source must not
      // kill the maintenance stream — refresh reads the changelog itself
      .option("skip-row-level-changes", "true")
      .table(s"$catalogName.${(sourceIdent.namespace :+ sourceIdent.name).mkString(".")}.stream")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        graft.engine.GraftMaterializedViews.refresh(spark, catalog, mvIdent)
        ()
      }
      .start()
}
