package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round profiler (r19): per-query breakdown of where the
  * bench seconds go — DataFrame construction (any eager work at build
  * time), physical planning, and execution — plus scheduler-shape
  * counters (jobs / stages / tasks launched by the measured pass) so a
  * "slow query" is attributable to plan complexity, job count, or
  * per-task work without the (disabled) UI.
  *
  * Methodology matches Bench.runOnce exactly (same session confs, same
  * noop sink); each query gets one untimed warmup pass then one
  * measured pass, with the same inter-query cache hygiene. This main is
  * a DIAGNOSTIC — the artifact of record stays graft.Bench.
  *
  * Usage: SPARK_GRAFT_PROF_ONLY=q_a,q_b sbt "runMain graft.Prof"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      }
    })

    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    val only = sys.env.get("SPARK_GRAFT_PROF_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }

    println("name,construct_s,plan_s,exec_s,total_s,jobs,stages,tasks,task_time_s")
    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // warmup (untimed)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable => System.err.println(s"$name warmup FAILED: $e") }
      hygiene()
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
        println(s"$name,${s(t0, t1)},${s(t1, t2)},${s(t2, t3)},${s(t0, t3)}," +
          s"${jobs.get},${stages.get},${tasks.get},${taskTimeMs.get / 1000.0}")
      } catch {
        case e: Throwable => System.err.println(s"$name FAILED: $e")
      }
      hygiene()
    }
    spark.stop()
  }
}
