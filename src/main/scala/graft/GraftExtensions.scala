package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, JaccardSim, KnownNonNullElements, L2Distance, PolyHash}

/** Session-extension entry point: configure
  * `spark.sql.extensions=graft.GraftExtensions` and every session
  * (including ones created by thrift/connect servers, where runtime
  * registration hooks don't run) gets the graft-native expressions in
  * its function registry — the deployment-grade alternative to the
  * per-session [[graft.functions.PolyHash.register]] used by the demo
  * queries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSim].getName, "graft_jaccard"),
      (exprs: Seq[Expression]) => JaccardSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Distance].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dense"),
      new ExpressionInfo(classOf[KnownNonNullElements].getName, "graft_dense"),
      (exprs: Seq[Expression]) => KnownNonNullElements(exprs.head)))
    // whole-operator extension: plans graft.plans.AsOfJoin nodes
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
