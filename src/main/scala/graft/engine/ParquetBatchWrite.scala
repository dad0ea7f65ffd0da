package graft.engine

import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.types.{DataType, DateType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Distributed V2 `BatchWrite` over Spark's builtin parquet writer: each
  * task streams its `InternalRow`s straight into parquet files under
  * the table's data directory (no driver funnel, no row buffering), the
  * driver collects the per-task file inventory from the commit
  * messages, and `onCommit` turns it into ONE snapshot commit. This is
  * the write half of the SQL row-level operations (MERGE/UPDATE), where
  * Spark requires a genuine `BatchWrite` — the V1 insert bridge is not
  * accepted there.
  *
  * Partitioned tables route rows dynamically: the driver ships the
  * table's partition-transform expressions pre-bound to row ordinals
  * ([[PartitionRouting]]), each task evaluates them per row and keeps
  * one open writer per partition tuple it encounters, and the tuple
  * travels back in the commit message — the manifest never has to
  * re-derive it from paths.
  *
  * Scale: writer parallelism is the incoming query's partitioning;
  * every task writes independently and ships only (path, bytes, rows,
  * partition) to the driver — bytes and rows are captured IN the task
  * (file status after close, per-row count), so the driver never walks
  * the output directory or opens parquet footers. Zero-row tasks
  * produce no file. The write declares a clustered distribution on the
  * partition source columns, so tasks see few distinct partition tuples
  * instead of all of them.
  */
final class ParquetBatchWrite(
    dataDir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    routing: Option[ParquetBatchWrite.PartitionRouting],
    onCommit: Seq[ParquetBatchWrite.WrittenFile] => Unit,
    fromRowLevelOperation: Boolean = false)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ParquetBatchWrite.Factory(dataDir, schema, factory, conf, routing,
      fromRowLevelOperation)

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
  final case class WrittenFile(
      path: String, bytes: Long, rows: Long,
      partition: Map[String, String] = Map.empty,
      content: String = Manifests.ContentData,
      /** per-column min/max/nulls by field id, folded from the footer
        * the task just wrote ([[ParquetStats.fromFooter]]) */
      stats: Map[Int, Manifests.ColumnStats] = Map.empty)
  final case class FilesMessage(files: Seq[WrittenFile]) extends WriterCommitMessage

  /** Partition derivation shipped to executors: spec field names plus
    * the transform expressions bound to the write schema's ordinals. */
  final case class PartitionRouting(
      names: Seq[String], exprs: Seq[Expression]) extends Serializable

  /** Run a standalone distributed write of `df` into `dataDir` with the
    * same per-task machinery the V2 [[ParquetBatchWrite]] uses, and
    * return the inventory the tasks report. This is the write half of
    * the programmatic paths (INSERT/append, CTAS staging, delete-file
    * writes): the inventory — path, bytes, rows, partition tuple — is
    * assembled ON the executors, so committing N files costs the driver
    * O(N) commit-message decoding and zero filesystem I/O. */
  def writeJob(
      df: DataFrame,
      dataDir: String,
      routing: Option[PartitionRouting]): Seq[WrittenFile] = {
    val spark = df.sparkSession
    val schema = df.schema
    val (factory, conf) = org.apache.spark.sql.GraftShims.parquetWriteSpec(
      spark, schema, Map.empty)
    org.apache.spark.sql.GraftShims.internalRdd(df)
      .mapPartitionsWithIndex { (pid, rows) =>
        val taskId = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(pid.toLong)
        val w = new TaskWriter(dataDir, schema, factory, conf, routing, pid, taskId,
          fromRowLevelOperation = false)
        try { rows.foreach(w.write); Iterator.single(w.commitFiles()) }
        catch { case t: Throwable => w.abort(); throw t }
      }
      .collect().toSeq.flatten
  }

  /** External string form of a partition value — the same rendering the
    * legacy `partitionBy` directories produced, so manifests stay
    * comparable across write paths. */
  private def render(v: Any, dt: DataType): String = v match {
    case null => "__HIVE_DEFAULT_PARTITION__"
    case u: UTF8String => u.toString
    case i: java.lang.Integer if dt == DateType =>
      java.time.LocalDate.ofEpochDay(i.longValue()).toString
    case other => other.toString
  }

  /** The per-task write state shared by the V2 `DataWriter` and the
    * standalone [[writeJob]]: one open parquet writer per partition
    * tuple, per-partition row counts, and a commit that closes the
    * writers and stats the files (bytes) executor-side. */
  private[engine] final class TaskWriter(
      dataDir: String,
      schema: StructType,
      factory: OutputWriterFactory,
      conf: SerializableConfiguration,
      routing: Option[PartitionRouting],
      partitionId: Int,
      taskId: Long,
      fromRowLevelOperation: Boolean) {

    private val writers =
      scala.collection.mutable.LinkedHashMap.empty[Map[String, String], OutputWriter]
    private val rowCounts =
      scala.collection.mutable.LinkedHashMap.empty[Map[String, String], Long]
    private val paths =
      scala.collection.mutable.LinkedHashMap.empty[Map[String, String], String]

    // Group-based row-level plans (MERGE/UPDATE) without connector
    // metadata columns reach the plain writing task with the leading
    // RowDeltaUtils.OPERATION_COLUMN still attached (Spark only strips
    // it on the metadata-projection path). That extra column is ONLY
    // legitimate on the row-level-operation write path — everywhere
    // else an arity mismatch is a real wiring bug and must fail, never
    // silently shift ordinals.
    private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
    private var checked = false

    private def newWriter(suffix: String): OutputWriter = {
      val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
          partitionId), taskId.toInt))
      // NAMING INVARIANT: data-file paths are recorded VERBATIM in
      // manifests and (via the `_file` lineage column) in position-
      // delete `file_path` values; [[GraftDeleteCache.fileKey]] matches
      // them by full scheme-stripped path, so the path written here
      // must be the one the scan lists. Layout changes (e.g. hive-style
      // partition dirs) are safe as long as that round trip holds.
      factory.newInstance(s"$dataDir/part-$partitionId-$taskId$suffix.parquet",
        schema, ctx)
    }

    def write(record: InternalRow): Unit = {
      if (!checked) {
        checked = true
        if (fromRowLevelOperation && record.numFields == schema.length + 1)
          proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
            schema, (1 to schema.length).toIndexedSeq)
        else require(record.numFields == schema.length,
          s"row arity ${record.numFields} does not match write schema ${schema.length}" +
            (if (fromRowLevelOperation) " (+1 operation column also accepted)" else ""))
      }
      val row: InternalRow =
        if (proj != null) { proj.project(record); proj } else record
      val partition = routing match {
        case None => Map.empty[String, String]
        case Some(r) => r.names.zip(r.exprs)
          .map { case (n, e) => n -> render(e.eval(row), e.dataType) }.toMap
      }
      val writer = writers.getOrElseUpdate(partition, {
        val w = newWriter(if (routing.isEmpty) "" else s"-${writers.size}")
        paths(partition) = w.path()
        w
      })
      writer.write(row)
      rowCounts(partition) = rowCounts.getOrElse(partition, 0L) + 1
    }

    private var closed = false

    /** Close exactly once: a failure after commitFiles() closed the
      * writers triggers abort(), which must not double-close (masking
      * the original exception) nor stop at the first failing close. */
    private def closeAll(): Unit = {
      if (closed) return
      closed = true
      var first: Throwable = null
      writers.values.foreach { w =>
        try w.close()
        catch { case t: Throwable => if (first == null) first = t }
      }
      if (first != null) throw first
    }

    def commitFiles(): Seq[WrittenFile] = {
      closeAll()
      paths.toSeq.map { case (partition, path) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val bytes = p.getFileSystem(conf.value).getFileStatus(p).getLen
        // column stats fold from the footer THIS task wrote — executor-
        // side, one local footer read, zero driver I/O (columns without
        // a stamped field id — e.g. delete-file schemas — record none)
        val stats = ParquetStats.fromFooter(path, conf.value, schema)
        WrittenFile(path, bytes, rowCounts(partition), partition, stats = stats)
      }
    }

    def abort(): Unit = closeAll()
  }

  private final class Factory(
      dataDir: String,
      schema: StructType,
      factory: OutputWriterFactory,
      conf: SerializableConfiguration,
      routing: Option[PartitionRouting],
      fromRowLevelOperation: Boolean)
      extends DataWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val w = new TaskWriter(dataDir, schema, factory, conf, routing,
          partitionId, taskId, fromRowLevelOperation)
        override def write(record: InternalRow): Unit = w.write(record)
        override def commit(): WriterCommitMessage = FilesMessage(w.commitFiles())
        override def abort(): Unit = w.abort()
        override def close(): Unit = ()
      }
  }
}
