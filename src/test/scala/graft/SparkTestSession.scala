package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed suites (sbt forks a
  * single test JVM; SparkSession.builder.getOrCreate dedups). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // bounded-buffer imperative aggregates (CappedCollect, TopK) are
      // hash-friendly: the default 128-key sort-based fallback would
      // make every high-cardinality capped-collect sort its input
      // map-side. Sized from the ACTUAL cap (<= 100 at every call
      // site): 100k keys x 101 longs x 8 B ~= 80 MB/task worst case
      // (1M keys would be ~800 MB and can OOM before falling back)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the library's SQL surface: functions + extension parser
      // (ALTER ... PARTITION FIELD, CALL system.<proc>)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // id-based parquet column resolution for catalog-table scans
      // (SchemaBridge.ParquetFieldId); name-matching still applies to
      // files without ids (ignoreMissing)
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
