package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnShim, TypeShim}
import org.apache.spark.sql.types._

/** HyperLogLog register array as a custom Catalyst
  * TypedImperativeAggregate — the MERGEABLE-STATE counterpart of the
  * built-in `approx_count_distinct`, which answers one query and
  * throws its sketch away. Here the registers themselves are the
  * output (array<long>, length m): store one row per day/partition/
  * source, then merge stored sketches LOSSLESSLY later (register max
  * is associative, commutative and idempotent), which is how 100 TB
  * pipelines keep distinct-count stats incremental — union a year of
  * daily sketches in milliseconds instead of re-scanning a year of
  * data. Estimates are raw-HLL (`alpha·m²/Σ2^-reg`), deterministic
  * because the register array is (max is order-proof) and the
  * harmonic sum is evaluated in fixed index order.
  *
  * Hashing: the engine's xxhash64 (seed 42, exactly `xxhash64(x)`);
  * bucket = low log2(m) bits, rank = leading-zero count of the
  * remaining 64−p bits + 1 — all reproducible in pure SQL by the
  * oracle. Input must be LONG (hash wider keys first).
  */
case class HllRegistersAgg(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(m >= 16 && m <= 65536 && (m & (m - 1)) == 0,
    s"m must be a power of two in [16,65536], got $m")

  private val p: Int = java.lang.Integer.numberOfTrailingZeros(m)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v.asInstanceOf[Long], LongType, 42L)
      val bucket = (h & (m - 1)).toInt
      val w = h >>> p
      val rank =
        if (w == 0L) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(w) - p + 1
      if (rank > buffer(bucket)) buffer(bucket) = rank.toLong
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (other(i) > buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)

  override def inputTypes = TypeShim.oneLong
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"
}

object HllSketch {

  /** alpha_m of the raw HLL estimator — computed once in JVM double
    * arithmetic; gates interpolate THIS value into the oracle so both
    * engines start from the identical IEEE literal.
    */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m.toDouble)

  /** The register-array aggregate as a Column. */
  def registers(item: Column, m: Int): Column =
    ColumnShim.column(
      HllRegistersAgg(ColumnShim.expression(item), m).toAggregateExpression())

  /** Raw-HLL estimate from a register-array COLUMN (by name):
    * floor(alpha·m²/Σ2^-reg), harmonic sum in FIXED index order
    * (transform preserves array order) so the double result is
    * bit-identical on every engine that sums in the same order. Every
    * 2^-reg term is an exact double (integer shift, then divide), the
    * alpha·m² factor is passed through a string→double cast so both
    * engines start from the identical IEEE value; only the running sum
    * rounds — identically, given the order.
    */
  def estimate(regsCol: String, m: Int): Column = {
    val am2 = alpha(m) * m.toDouble * m.toDouble
    org.apache.spark.sql.functions.expr(
      s"""CAST(floor(CAST('$am2' AS DOUBLE) / aggregate(
         |  transform($regsCol, r -> CAST(1.0 AS DOUBLE) /
         |    CAST(shiftleft(CAST(1 AS BIGINT), CAST(r AS INT)) AS DOUBLE)),
         |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) AS BIGINT)""".stripMargin)
  }

  /** The same harmonic-sum estimate as DuckDB SQL over a LIST column
    * expression — the oracle twin of [[estimate]], kept adjacent so the
    * two cannot drift.
    */
  def estimateOracleSql(regsListExpr: String, m: Int): String = {
    val am2 = alpha(m) * m.toDouble * m.toDouble
    s"""CAST(floor(CAST('$am2' AS DOUBLE) / list_reduce(
       |  list_transform($regsListExpr, r -> CAST(1.0 AS DOUBLE) /
       |    CAST((1::BIGINT << CAST(r AS INT)) AS DOUBLE)),
       |  (acc, x) -> acc + x)) AS BIGINT)""".stripMargin
  }
}
