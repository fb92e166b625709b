package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst Expressions and the public Column
  * API. Spark 4 made Column construction session-internal
  * (`private[sql] ExpressionUtils`); extensions conventionally shim it
  * from inside the `org.apache.spark.sql` namespace, which is what
  * this object does — nothing else from the internals is touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom function into an ALREADY-RUNNING session's
    * registry (SparkSessionExtensions only applies at session build
    * time; `sessionState` is private[sql], hence this shim).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}

/** Plan-introspection helpers that need the `org.apache.spark.sql`
  * namespace (classic `Dataset.queryExecution` is session-internal).
  */
object PlanShim {
  /** The id of the persisted RDD backing a `localCheckpoint`ed
    * Dataset. `Dataset.localCheckpoint` persists exactly one RDD —
    * the `LogicalRDD` leaf's — so reading it off the plan identifies
    * the checkpoint blocks WITHOUT diffing
    * `SparkContext.getPersistentRDDs`, which races against any other
    * thread persisting RDDs on the shared context (a set-diff there
    * can adopt — and later unpersist — an unrelated query's cache).
    */
  def checkpointedRddId(ds: org.apache.spark.sql.Dataset[_]): Int =
    ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case other => throw new IllegalStateException(
        s"expected LogicalRDD after localCheckpoint, got ${other.nodeName}")
    }
}

/** Input-type specs for custom expressions: `AbstractDataType` is
  * private[sql], so third-party ExpectsInputTypes implementations get
  * their Seq values from inside the namespace (return types inferred).
  */
object TypeShim {
  import org.apache.spark.sql.types._
  val oneString: Seq[AbstractDataType] = Seq(StringType)
  val twoStrings: Seq[AbstractDataType] = Seq(StringType, StringType)
  val oneLong: Seq[AbstractDataType] = Seq(LongType)
  val oneFloatArray: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  val twoFloatArrays: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  val twoLongs: Seq[AbstractDataType] = Seq(LongType, LongType)
}
