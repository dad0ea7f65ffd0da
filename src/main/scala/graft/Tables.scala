package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for loading the driver testdata and for writing
  * oracle-deterministic aggregates.
  *
  * Determinism contract with the DuckDB oracle: floating-point SUM/AVG is
  * order-dependent, and Spark and DuckDB will visit rows in different
  * orders. Every monetary/quantity aggregate therefore goes through an
  * exact DECIMAL cast (sums of decimals are associative), and only the
  * final result is cast back to DOUBLE. AVG is expressed as
  * decimal-sum / count so both engines perform the identical single
  * double division.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; with spark.sql.legacy.parquet.nanosAsLong=true
      // it reads as the raw int64 nanos, which we truncate to micros
      // (integer div — the value exceeds 2^53, double math would lose
      // precision). DuckDB does the same ns→µs truncation natively.
      // The flag is session-construction config (set in Verify/Bench
      // builders); if the hosting session (e.g. the driver's own) was
      // built without it, set it once here — idempotent, and flagged
      // loudly rather than silently flipped per load() call.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true") {
        System.err.println(
          "[graft] session built without spark.sql.legacy.parquet.nanosAsLong=true; " +
            "setting it now (required to read events.parquet TIMESTAMP(NANOS))")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      }
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact decimal view of a double column (testdata doubles carry <=2dp). */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** Order-independent SUM over a double column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic AVG: exact decimal sum, one double division. */
  def davg(c: Column): Column = (sum(dec(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Timestamp literal in the UTC session zone. */
  def ts(s: String): Column = to_timestamp(lit(s))
}
