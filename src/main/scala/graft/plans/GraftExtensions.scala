package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** Session-extension entry point: wire graft's native expressions into any
  * SparkSession via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (cluster submit) or `.withExtensions(new GraftExtensions)` (embedded).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}
