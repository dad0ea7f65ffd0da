package graft.engine

import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Distributed V2 `BatchWrite` over Spark's builtin parquet writer: each
  * task streams its `InternalRow`s straight into a parquet file under
  * the table's data directory (no driver funnel, no row buffering), the
  * driver collects the per-task file inventory from the commit
  * messages, and `onCommit` turns it into ONE snapshot commit. This is
  * the write half of the SQL row-level operations (MERGE/UPDATE), where
  * Spark requires a genuine `BatchWrite` — the V1 insert bridge is not
  * accepted there.
  *
  * Scale: writer parallelism is the incoming query's partitioning;
  * every task writes independently and ships only (path, rows) to the
  * driver. Zero-row tasks produce no file.
  */
final class ParquetBatchWrite(
    dataDir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    onCommit: Seq[ParquetBatchWrite.WrittenFile] => Unit)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ParquetBatchWrite.Factory(dataDir, schema, factory, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    onCommit(messages.toSeq.flatMap {
      case ParquetBatchWrite.FilesMessage(files) => files
      case other => sys.error(s"unexpected commit message: $other")
    })

  /** Leftover files are unreferenced by any manifest — invisible to
    * readers, reclaimable by an orphan sweep (same policy as the
    * reference's no-purge drop). */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

object ParquetBatchWrite {
  final case class WrittenFile(path: String, rows: Long)
  final case class FilesMessage(files: Seq[WrittenFile]) extends WriterCommitMessage

  private final class Factory(
      dataDir: String,
      schema: StructType,
      factory: OutputWriterFactory,
      conf: SerializableConfiguration)
      extends DataWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val path = s"$dataDir/part-$partitionId-$taskId.parquet"
        private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
        private var rows = 0L

        // Group-based row-level plans (MERGE/UPDATE) without connector
        // metadata columns reach the plain writing task with the
        // leading __row_operation column still attached (Spark only
        // strips it on the metadata-projection path). Project it away
        // with Spark's own ordinal projection.
        private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _

        override def write(record: InternalRow): Unit = {
          if (writer == null) {
            val ctx = new TaskAttemptContextImpl(conf.value,
              new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
                partitionId), taskId.toInt))
            writer = factory.newInstance(path, schema, ctx)
            if (record.numFields == schema.length + 1)
              proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
                schema, (1 to schema.length).toIndexedSeq)
            else require(record.numFields == schema.length,
              s"row arity ${record.numFields} does not match write schema ${schema.length}")
          }
          if (proj != null) { proj.project(record); writer.write(proj) }
          else writer.write(record)
          rows += 1
        }

        override def commit(): WriterCommitMessage = {
          if (writer != null) writer.close()
          if (rows == 0) FilesMessage(Nil) else FilesMessage(Seq(WrittenFile(path, rows)))
        }

        override def abort(): Unit = if (writer != null) writer.close()

        override def close(): Unit = ()
      }
  }
}
