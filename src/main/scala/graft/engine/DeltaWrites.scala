package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** The write half of SupportsDelta row-level operations (SQL MERGE /
  * UPDATE / DELETE): each task receives only the CHANGED rows — inserts
  * as full rows, deletes as `(_file, _pos)` row ids — and writes them
  * as new data files plus position-delete files. Untouched files never
  * move; the commit appends the delta on top of the base snapshot
  * ([[GraftTable.commitDelta]]), so a 1-row MERGE on a 100 TB table
  * writes O(1 row), not O(table). Updates arrive as delete+insert
  * pairs (`representUpdateAsDeleteAndInsert`).
  *
  * Inserts route through the same per-partition-tuple task writer as
  * every other write path; position deletes accumulate into one
  * unpartitioned parquet file per task with Iceberg's delete-file
  * schema `(file_path, pos)`.
  */
final class GraftDeltaWrite(
    dataDir: String,
    deleteDir: String,
    writeSchema: StructType,
    dataWrite: (OutputWriterFactory, SerializableConfiguration),
    deleteWrite: (OutputWriterFactory, SerializableConfiguration),
    routing: Option[ParquetBatchWrite.PartitionRouting],
    onCommit: Seq[ParquetBatchWrite.WrittenFile] => Unit)
    extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftDeltaWrite.Factory(dataDir, deleteDir, writeSchema,
        dataWrite, deleteWrite, routing)

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      onCommit(messages.toSeq.flatMap {
        case ParquetBatchWrite.FilesMessage(files) => files
        case other => sys.error(s"unexpected commit message: $other")
      })

    /** Uncommitted files are unreferenced orphans — invisible to
      * readers, reclaimable by an orphan sweep. */
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
}

object GraftDeltaWrite {

  private final class Factory(
      dataDir: String,
      deleteDir: String,
      writeSchema: StructType,
      dataWrite: (OutputWriterFactory, SerializableConfiguration),
      deleteWrite: (OutputWriterFactory, SerializableConfiguration),
      routing: Option[ParquetBatchWrite.PartitionRouting])
      extends DeltaWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
      new DeltaWriter[InternalRow] {
        // each write kind carries its OWN hadoop conf: the parquet
        // write support reads its schema from the task conf, so the
        // delete writer must not see the data schema's conf
        private val dataW = new ParquetBatchWrite.TaskWriter(
          dataDir, writeSchema, dataWrite._1, dataWrite._2, routing,
          partitionId, taskId, fromRowLevelOperation = false)
        private lazy val deleteW = new ParquetBatchWrite.TaskWriter(
          deleteDir, GraftTable.PosDeleteSchema, deleteWrite._1, deleteWrite._2,
          routing = None, partitionId, taskId, fromRowLevelOperation = false)
        private var deleted = false

        override def insert(row: InternalRow): Unit = dataW.write(row)

        /** id = (_file, _pos) per [[graft.engine.GraftSparkCatalog]]'s
          * rowId declaration. The tuple is written out immediately, so
          * no copy of the (reused) projection row is needed. */
        override def delete(metadata: InternalRow, id: InternalRow): Unit = {
          deleted = true
          deleteW.write(new GenericInternalRow(
            Array[Any](id.getUTF8String(0), id.getLong(1))))
        }

        /** Updates are represented as delete+insert; a direct update
          * call would mean the declaration was ignored. */
        override def update(
            metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
          throw new IllegalStateException(
            "updates must arrive as delete+insert (representUpdateAsDeleteAndInsert)")

        override def commit(): WriterCommitMessage = {
          val dels =
            if (!deleted) Nil
            else deleteW.commitFiles()
              .map(_.copy(content = Manifests.ContentPositionDeletes))
          ParquetBatchWrite.FilesMessage(dataW.commitFiles() ++ dels)
        }

        override def abort(): Unit = {
          dataW.abort()
          if (deleted) deleteW.abort()
        }

        override def close(): Unit = ()
      }
  }
}
