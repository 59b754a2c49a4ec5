package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the
  * engine's custom expressions as SQL functions in every session of
  * the cluster (the Column API in [[VectorFunctions]] needs no
  * registration). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorFunctions.allFunctionInfos.foreach(ext.injectFunction)
}
