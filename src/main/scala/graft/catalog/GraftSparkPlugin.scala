package graft.catalog

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

import java.util.{Map => JMap}

/** Cluster wiring for the metadata-plane [[FileIO]] registry: manifest
  * shards are parsed EXECUTOR-side (distributed `.files`/`.partitions`
  * scans), so remote backends must be registered in every JVM, not
  * just the driver. Configure
  *
  * {{{
  *   --conf spark.plugins=graft.catalog.GraftSparkPlugin
  *   --conf spark.graft.s3.region=us-east-1
  *   --conf spark.graft.s3.access-key-id=...
  *   --conf spark.graft.s3.secret-access-key=...
  *   --conf spark.graft.s3.endpoint=http://minio:9000   (optional)
  * }}}
  *
  * and both driver and executors register an [[S3FileIO]] for `s3://`
  * at startup (the moral equivalent of the reference resolving its
  * storage profile per warehouse — here per cluster; per-warehouse
  * credentials stay on the catalog/signer side). Reading credentials
  * from Spark conf mirrors Hadoop-S3A's `fs.s3a.access.key` practice;
  * on a real deployment prefer an instance-profile-style provider
  * behind the same registration hook.
  */
class GraftSparkPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext, ctx: PluginContext): JMap[String, String] = {
      GraftSparkPlugin.registerFromConf(k => sc.getConf.getOption(k))
      java.util.Collections.emptyMap()
    }
  }
  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext, extraConf: JMap[String, String]): Unit =
      GraftSparkPlugin.registerFromConf(k => Option(ctx.conf.get(k, null)))
  }
}

object GraftSparkPlugin {
  /** Register backends named by `spark.graft.*` conf keys; idempotent
    * (re-registration replaces). Exposed for direct use in tests and
    * non-plugin wiring. */
  def registerFromConf(conf: String => Option[String]): Unit =
    for {
      region <- conf("spark.graft.s3.region")
      key <- conf("spark.graft.s3.access-key-id")
      secret <- conf("spark.graft.s3.secret-access-key")
    } FileIO.register("s3", new S3FileIO(
      key, secret, region, endpoint = conf("spark.graft.s3.endpoint")))
}
