package graft

import graft.functions.{DotProduct, MinHash20, SimHash63}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the
  * engine's native expressions so they are callable from SQL text and
  * `expr(...)`. Installed by GraftSession via
  * `spark.sql.extensions=graft.GraftExtensions` — the public,
  * cluster-safe mechanism (no session-state hacks; works identically
  * under spark-submit on a real cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash63"),
      new ExpressionInfo(classOf[SimHash63].getName, "graft_simhash63"),
      (children: Seq[Expression]) => SimHash63(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash20"),
      new ExpressionInfo(classOf[MinHash20].getName, "graft_minhash20"),
      (children: Seq[Expression]) => MinHash20(children.head)))
    // bounded edit-distance comparisons → banded thresholded DP
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThreshold)
  }
}
