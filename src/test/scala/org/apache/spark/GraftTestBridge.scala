package org.apache.spark

/** Test-only accessor for the live SparkContext conf (private[spark]).
  * GraftExtensionsSpec plants spark.sql.extensions there — the location
  * Builder.getOrCreate actually reads extensions from — to emulate a
  * spark-submit --conf deployment on the shared test context.
  */
object GraftTestBridge {
  def contextConf(sc: SparkContext): SparkConf = sc.conf
}
