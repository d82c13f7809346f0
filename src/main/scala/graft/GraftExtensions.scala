package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extensions entry point: inject graft's native expressions
  * into any session via standard configuration —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — after which `SELECT graft_dot(a, b)` works from plain SQL with no
  * imports. The same registration is also done lazily by
  * [[graft.functions.VectorFunctions.dot]] for DataFrame callers, so
  * the extension is a convenience, not a requirement.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.VectorFunctions.injections.foreach(ext.injectFunction)
    graft.functions.CdcFunctions.injections.foreach(ext.injectFunction)
    graft.functions.RepStripFunctions.injections.foreach(ext.injectFunction)
    graft.functions.StripCoverageFunctions.injections.foreach(ext.injectFunction)
  }
}
