package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT word_shingles(text, 3) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      GraftExtensions.wordShinglesBuilder))
  }
}

object GraftExtensions {
  private[plans] val wordShinglesBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "word_shingles(text, n)")
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_shingles n must be an integer literal, got $other")
    }
    WordShingles(exprs.head, n)
  }

  /** Register into an already-running session (extensions only apply at
    * session construction; this covers notebooks / shared sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.ColumnShim.registerFunction(
      spark, "word_shingles", wordShinglesBuilder)
}
