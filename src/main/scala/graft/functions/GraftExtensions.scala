package graft.functions

import graft.Hashing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.bridge

/** SQL registration of the graft expressions, two ways:
  *
  *  - config-time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the idiomatic SparkSessionExtensions hook), or
  *  - runtime: `GraftExtensions.register(spark)` for an existing session
  *    (e.g. the driver-provided one).
  *
  * After either, SQL users can call `graft_roll_hash(s[, mod])`,
  * `graft_min_gram_hash(s, k[, mod])`, `graft_simhash32(arr)`,
  * `graft_minhash_sig(arr)`, `graft_word_shingles(s[, n])`,
  * `graft_lev_bounded(a, b, threshold)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // persistent SQL views over IceLiteCatalog warehouses (vanilla Spark
    // ships the V2 ViewCatalog API but wires neither DDL nor reads — see
    // IceViewSupport): DDL reroutes at parse time, reads resolve by rule
    ext.injectParser((session, delegate) =>
      new graft.sources.IceViewParser(session, delegate))
    ext.injectResolutionRule(session => new graft.sources.ResolveIceViews(session))
  }
}

object GraftExtensions {

  private def lit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_roll_hash", info("graft_roll_hash", "rolling char hash mod m"),
      (es: Seq[Expression]) => RollHashExpr(es.head, es.lift(1).map(lit(_, "mod")).getOrElse(Hashing.P))),
    ("graft_min_gram_hash", info("graft_min_gram_hash", "min k-gram rolling hash"),
      (es: Seq[Expression]) => MinGramHashExpr(
        es.head,
        lit(es(1), "k").toInt,
        es.lift(2).map(lit(_, "mod")).getOrElse(Hashing.P))),
    ("graft_simhash32", info("graft_simhash32", "32-bit simhash of a word array"),
      (es: Seq[Expression]) => SimHash32Expr(es.head)),
    ("graft_minhash_sig", info("graft_minhash_sig", "16-value minhash signature of a hash array"),
      (es: Seq[Expression]) => MinHashSigExpr(
        es.head,
        Hashing.minhashParams.map(_._2).toArray,
        Hashing.minhashParams.map(_._3).toArray,
        Hashing.P)),
    ("graft_word_shingles", info("graft_word_shingles", "distinct word n-gram shingles"),
      (es: Seq[Expression]) => WordShinglesExpr(es.head, es.lift(1).map(lit(_, "n").toInt).getOrElse(3))),
    ("graft_lev_bounded", info("graft_lev_bounded",
      "levenshtein(a, b) when <= threshold, else -1 " +
        "(code-point semantics like builtin levenshtein; affix-trimmed banded DP)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        StaticInvoke(LevStatics.getClass, LongType, "levBounded",
          Seq(es(0), es(1), es(2)),
          inputTypes = Seq(StringType, StringType, IntegerType),
          propagateNull = true, returnNullable = false)
      })
  )

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) => bridge.registerFunction(spark, name, builder) }
}
