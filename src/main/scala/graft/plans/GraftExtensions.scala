package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so e.g.
  * `spark.sql("SELECT word_shingles(text, 3) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
}

object GraftExtensions {

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[plans] val wordShinglesBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "word_shingles(text, n)")
    WordShingles(exprs.head, intLiteral(exprs(1), "word_shingles n"))
  }

  private[plans] val simhash64Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "simhash64(text)")
    SimHash64(exprs.head)
  }

  private[plans] val cosineSimBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "cosine_sim(a, b)")
    CosineSimilarity(exprs.head, exprs(1))
  }

  private[plans] val lshSignatureBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "lsh_signature(vec, planes)")
    LshSignature(exprs.head, intLiteral(exprs(1), "lsh_signature planes"))
  }

  private[plans] val seededMixBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 3, "seeded_mix(h1, h2, seed)")
    SeededMix(exprs.head, exprs(1), intLiteral(exprs(2), "seeded_mix seed"))
  }

  private[plans] val nfcNormalizeBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "nfc_normalize(text)")
    NfcNormalize(exprs.head)
  }

  private[plans] val cmSketchBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 3, "cm_sketch(x, depth, width)")
    CountMinSketchAgg(exprs.head, intLiteral(exprs(1), "cm_sketch depth"),
      intLiteral(exprs(2), "cm_sketch width")).toAggregateExpression()
  }

  private[plans] val hllRegistersBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "hll_registers(x, m)")
    HllRegistersAgg(exprs.head, intLiteral(exprs(1), "hll_registers m"))
      .toAggregateExpression()
  }

  private[plans] val gramHashesBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "positioned_gram_hashes(text, k)")
    PositionedGramHashes(exprs.head, intLiteral(exprs(1), "positioned_gram_hashes k"))
  }

  private val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cm_sketch", classOf[CountMinSketchAgg], cmSketchBuilder),
    ("hll_registers", classOf[HllRegistersAgg], hllRegistersBuilder),
    ("word_shingles", classOf[WordShingles], wordShinglesBuilder),
    ("simhash64", classOf[SimHash64], simhash64Builder),
    ("cosine_sim", classOf[CosineSimilarity], cosineSimBuilder),
    ("lsh_signature", classOf[LshSignature], lshSignatureBuilder),
    ("seeded_mix", classOf[SeededMix], seededMixBuilder),
    ("nfc_normalize", classOf[NfcNormalize], nfcNormalizeBuilder),
    ("positioned_gram_hashes", classOf[PositionedGramHashes], gramHashesBuilder))

  /** Register into an already-running session (extensions only apply at
    * session construction; this covers notebooks / shared sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, name, builder)
    }
}
