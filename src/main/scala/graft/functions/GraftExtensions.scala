package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions installer for the graft native expressions —
 * the public, spark-submit-compatible registration route
 * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`;
 * graft.Sessions sets it on every local session). Callers invoke the
 * functions through `org.apache.spark.sql.functions.call_function`,
 * keeping the whole surface on public API.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head,
        intLit(args(1), "k"), intLit(args(2), "numHashes"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles64"),
      new ExpressionInfo(classOf[Shingles64Expr].getName, "graft_shingles64"),
      (args: Seq[Expression]) => Shingles64Expr(args.head, intLit(args(1), "k"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard64"),
      new ExpressionInfo(classOf[Jaccard64Expr].getName, "graft_jaccard64"),
      (args: Seq[Expression]) => Jaccard64Expr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_langid"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "graft_langid"),
      (args: Seq[Expression]) => LangIdExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_bigram_stats"),
      new ExpressionInfo(classOf[BigramStatsExpr].getName, "graft_bigram_stats"),
      (args: Seq[Expression]) => BigramStatsExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      (args: Seq[Expression]) => LshBucketExpr(args.head,
        intLit(args(1), "nBits"), intLit(args(2), "seed"))))
  }
}
