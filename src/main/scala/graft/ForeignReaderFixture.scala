package graft

import org.apache.spark.sql.SparkSession

/** Foreign-reader fixture for the DATA-FILE layer (r17): builds a real
  * engine table (partitioned, multi-snapshot, compacted, special-char
  * partition values, sub-second timestamps, decimals, arrays, structs,
  * NULLs), then dumps
  *  - `<out>/files.json` — the CURRENT snapshot's data-file paths as
  *    the engine's own `.files` metadata table reports them, and
  *  - `<out>/expected/` — the engine's full `SELECT *`, written as
  *    plain Spark parquet.
  * `tools/duckdb_datafile_check.py` then reads the listed data files
  * with DuckDB — a genuinely independent engine — and compares the row
  * multiset against the expected dump. This is the offline-reachable
  * half of the standing foreign-reader item (pyiceberg/duckdb-iceberg
  * are network-blocked; the avro manifest layer is conformance-tested
  * against the upstream Apache Avro 1.12.1 runtime): it pins that
  * engine data files stay readable by a second engine — partition
  * columns, sub-second INT64-micros timestamps, decimals, nested
  * types, NULLs, unicode partition values, post-compaction files.
  * (DuckDB tolerates legacy INT96 too, so this check alone would not
  * have caught the pre-r16 INT96 writes — the INT64 fix matters for
  * parquet STATS and spec-conformant readers like pyiceberg; this
  * check pins the value-level contract.) Append/compact tables only —
  * MoR delete files need delete application a raw file read cannot
  * do, so the fixture avoids row-level deletes by construction. */
object ForeignReaderFixture {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_foreign_reader")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // the EXPECTED dump must be int64-micros too, so both sides of
      // the DuckDB comparison carry identical timestamp physics
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cat = "frx"
    val store = new graft.catalog.InMemoryCatalogStore
    val project = java.util.UUID.randomUUID()
    val server = new graft.server.CatalogServer(store, project).start()
    try {
      val whLoc = java.nio.file.Files.createTempDirectory("graft-frx")
        .toUri.toString.stripSuffix("/")
      val wh = store.createWarehouse(project, "wh", whLoc)
        .fold(e => sys.error(e.message), identity)
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.engine.GraftSparkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(
        s"""CREATE TABLE $cat.db.t (
           |  id BIGINT, ts TIMESTAMP, d DATE, dec DECIMAL(12,3), s STRING,
           |  arr ARRAY<BIGINT>, st STRUCT<x: BIGINT, y: STRING>, part STRING)
           |PARTITIONED BY (part)""".stripMargin)
      // snapshot 1: nulls, sub-second timestamps, negative decimals,
      // special-char + unicode partition values
      spark.sql(
        s"""INSERT INTO $cat.db.t VALUES
           |  (1, timestamp'2024-03-10 01:02:03.123456', date'2024-03-10',
           |   12345.678, 'plain', array(1L, 2L, 3L), named_struct('x', 7L, 'y', 'a'),
           |   'p=1/q 2'),
           |  (2, NULL, NULL, -0.001, NULL, array(), named_struct('x', NULL, 'y', NULL),
           |   'täble ümlaut'),
           |  (3, timestamp'1969-12-31 23:59:59.999999', date'1969-12-31',
           |   NULL, '', NULL, NULL, 'p=1/q 2')""".stripMargin)
      // snapshot 2: a second file in an existing partition + a new one
      spark.sql(
        s"""INSERT INTO $cat.db.t VALUES
           |  (4, timestamp'2024-03-10 01:02:03.123457', date'2024-03-11',
           |   0.000, 'x', array(9L), named_struct('x', 1L, 'y', 'z'), 'p=1/q 2'),
           |  (5, timestamp'2000-01-01 00:00:00', date'2000-01-01',
           |   99.999, 'y', array(NULL), named_struct('x', 2L, 'y', ''), 'third')""".stripMargin)
      // snapshot 3: compaction rewrites files — the rewritten files are
      // what the foreign reader sees
      spark.sql(s"CALL $cat.system.rewrite_data_files(" +
        s"table => 'db.t', target_file_count => 1)")

      val files = spark.sql(s"SELECT file_path FROM $cat.db.t.files")
        .collect().map(_.getString(0)).sorted
      require(files.nonEmpty, "fixture produced no data files")
      val json = files.map(p => "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "files.json"), json)
      spark.sql(s"SELECT * FROM $cat.db.t")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/expected")
      println(s"[frx] ${files.length} data files; expected dump at $outDir/expected")

      // ---- part 2 (r17): the MoR DELETE layer. A second table gathers
      // position-delete files (SQL DELETE) and equality-delete files
      // (replaceKeys — the MV/streaming maintenance writer), including
      // a NULL-keyed equality delete (the r16 GraftScan fix) and
      // same-commit replacement rows that the strictly-older rule must
      // keep. The checker re-implements the spec's delete application
      // in DuckDB SQL over the raw files.
      spark.sql(s"CREATE TABLE $cat.db.t2 (id BIGINT, k STRING, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.t2 VALUES " +
        "(1,'a',10),(2,'b',20),(3,NULL,30),(4,'d',40)")
      spark.sql(s"INSERT INTO $cat.db.t2 VALUES " +
        "(5,'a',50),(6,'e',60),(7,NULL,70)")
      // MoR position deletes across both batches
      spark.sql(s"DELETE FROM $cat.db.t2 WHERE v = 20 OR v = 60")
      val plugin = org.apache.spark.sql.GraftShims.catalogPlugin(spark, Some(cat))
        .asInstanceOf[graft.engine.GraftSparkCatalog]
      val t2 = plugin.engineTable(graft.catalog.TableIdent(Seq("db"), "t2"))
      // equality delete on k ∈ {'a', NULL} + same-commit replacement
      // rows with the SAME keys — strictly-older scoping must keep them
      import spark.implicits._
      val delKeys = Seq(Option("a"), Option.empty[String]).toDF("k")
      val repl = Seq((100L, Option("a"), 1000L), (101L, Option.empty[String], 1010L))
        .toDF("id", "k", "v")
      t2.replaceKeys(spark, Seq("k"), delKeys, repl,
        t2.metadata.currentSnapshotId)
      val byId = t2.metadata.currentSchema.fields.map(f => f.id -> f.name).toMap
      val pf = t2.planFiles().sortBy(_.path)
      require(pf.exists(_.isPositionDeleteFile), "fixture needs position deletes")
      require(pf.exists(f => f.isDeleteFile && !f.isPositionDeleteFile),
        "fixture needs equality deletes")
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val morJson = pf.map { f =>
        val cols = f.equalityIds.flatMap(byId.get)
          .map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")
        s"""{"path":"${esc(f.path)}","content":"${f.content}","seq":${f.seq},"cols":$cols}"""
      }.mkString("[", ",", "]")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir, "mor"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "mor", "files.json"), morJson)
      spark.sql(s"SELECT * FROM $cat.db.t2")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/mor/expected")
      println(s"[frx] mor: ${pf.count(!_.isDeleteFile)} data + " +
        s"${pf.count(_.isPositionDeleteFile)} pos-delete + " +
        s"${pf.count(f => f.isDeleteFile && !f.isPositionDeleteFile)} eq-delete files")

      // ---- part 3 (r18): the AVRO METADATA layer. Dump each table's
      // catalog metadata location plus the ENGINE's per-file claims
      // (path, content, data sequence number, record count, partition
      // tuple, equality ids, schema field ids) so
      // tools/avro_walk_check.py — a dependency-free from-the-spec
      // decoder of the avro object-container format — can walk
      // metadata.json → manifest-list → manifests INDEPENDENTLY and
      // cross-check the walk against both the engine's claims and
      // DuckDB-computed file truths.
      def metaLoc(name: String): String =
        store.loadTable(wh.id, graft.catalog.TableIdent(Seq("db"), name))
          .fold(e => sys.error(e.message), _.metadataLocation
            .getOrElse(sys.error(s"$name has no metadata location")))
      def tbl(name: String): graft.engine.GraftTable =
        plugin.engineTable(graft.catalog.TableIdent(Seq("db"), name))
      def fileJson(f: graft.engine.Manifests.DataFile): String = {
        val part = f.partition.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
          .mkString("{", ",", "}")
        s"""{"path":"${esc(f.path)}","content":"${f.content}","seq":${f.seq},""" +
          s""""record_count":${f.recordCount},"partition":$part,""" +
          s""""equality_ids":${f.equalityIds.mkString("[", ",", "]")}}"""
      }
      def tableJson(name: String): String = {
        val t = tbl(name)
        val fields = t.metadata.currentSchema.fields
          .map(f => "\"" + esc(f.name) + "\":" + f.id).mkString("{", ",", "}")
        val snap = t.metadata.currentSnapshotId
          .getOrElse(sys.error(s"$name has no snapshot"))
        s""""$name":{"metadata_location":"${esc(metaLoc(name))}",""" +
          s""""current_snapshot_id":$snap,"field_ids":$fields,""" +
          s""""files":${t.planFiles().sortBy(_.path).map(fileJson)
            .mkString("[", ",", "]")}}"""
      }
      // TIME TRAVEL through the walked avro layer (r18): pin table t's
      // EARLIEST snapshot (3 rows, pre-compaction) — the walker reads
      // that snapshot's own manifest list from the avro twins and must
      // reproduce the engine's snapshot-pinned scan, proving the
      // historical metadata stays walkable, not just the head
      val t1 = tbl("t")
      val earliest = t1.metadata.snapshots.values.minBy(_.sequenceNumber)
      spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF ${earliest.snapshotId}")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/expected_historical")
      val histJson =
        s""""historical":{"table":"t","snapshot_id":${earliest.snapshotId},""" +
          s""""expected_dir":"expected_historical"}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "walk.json"),
        s"{${tableJson("t")},${tableJson("t2")},$histJson}")
      println(s"[frx] walk: metadata locations + engine file claims at $outDir/walk.json")
      println("[frx] DONE")
    } finally {
      server.stop()
      spark.stop()
    }
  }
}
