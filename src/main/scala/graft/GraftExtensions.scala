package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, Fnv1a64, ProjectionDot, ShingleCodes}

/** Session-extensions entry point: registers graft's native codegen'd
  * expressions as SQL functions at session build time, so a cluster can
  * enable the whole function surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver-side
  * `register()` call needed. (The imperative path,
  * [[graft.functions.GraftFunctions.register]], stays for notebook use.)
  *
  * This is extension preference path (b) of the build rules: native
  * expressions with `doGenCode`, injected through the public
  * `SparkSessionExtensions` API — no fork, no private internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String): ExpressionInfo =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    ext.injectFunction((FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(bin) - FNV-1a 64-bit hash of a binary payload"),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - fused cosine between float/double arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle_codes"),
      info("shingle_codes",
        "shingle_codes(text, k) - base-128 k-shingle codes, one rolling pass"),
      (exprs: Seq[Expression]) => ShingleCodes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("projection_dot"),
      info("projection_dot",
        "projection_dot(vec, plane, dims) - dot with the deterministic projection vector"),
      (exprs: Seq[Expression]) => ProjectionDot(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        if (exprs.size > 2) exprs(2).eval().asInstanceOf[Number].intValue() else 64)))
  }
}
