package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnShim, TypeShim}
import org.apache.spark.sql.types._

/** Count-min sketch as a custom Catalyst AGGREGATE function
  * (TypedImperativeAggregate) — the approximate-frequency sketch for
  * heavy-hitter queries over 100 TB key streams, where an exact
  * per-key count would shuffle every distinct key and the question is
  * only "roughly how often does THIS key occur".
  *
  * Two deliberate design points:
  *
  *  1. It is an aggregate, not a relational rewrite: the buffer is a
  *     fixed depth×width Long array updated in place per row, partial-
  *     aggregated map-side and merged by commutative cell-wise adds —
  *     bounded state per partition regardless of key cardinality, one
  *     row out. (Spark ships `count_min_sketch`, but its hash family is
  *     its own implementation detail; this one exists so the sketch is
  *     portable — see 2.)
  *
  *  2. The hash family is the engine's own xxhash64 chain: row i hashes
  *     x with seed h(i), i.e. exactly `xxhash64(cast(i as long), x)` —
  *     so any engine that can reproduce XXH64 (the oracle does, in pure
  *     SQL) can rebuild the sketch bit-for-bit, and because cell adds
  *     commute the sketch is IDENTICAL under any partitioning or row
  *     order. Estimates are deterministic, not just bounded: the
  *     classic CM guarantee (est ≥ true; est ≤ true + εN w.h.p.) plus
  *     exact reproducibility.
  *
  * Returns the sketch as array<long> of length depth·width (row-major);
  * [[CountMinSketch.estimate]] reads it back with the matching hash
  * chain. Input must be LONG (hash wider keys to 64 bits first).
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 20), s"width must be in [2,2^20], got $width")

  // seed of row i = xxhash64 of the long i (seed 42) — the first link
  // of Spark's own multi-argument xxhash64(i, x) chain
  private lazy val seeds: Array[Long] =
    Array.tabulate(depth)(i => XxHash64Function.hash(i.toLong, LongType, 42L))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val h = XxHash64Function.hash(x, LongType, seeds(i))
        buffer(i * width + (((h % width) + width) % width).toInt) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(child = newChild)

  override def inputTypes = TypeShim.oneLong
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"
}

object CountMinSketch {

  /** The sketch aggregate as a Column: one array<long> row. */
  def sketch(item: Column, depth: Int, width: Int): Column =
    ColumnShim.column(
      CountMinSketchAgg(ColumnShim.expression(item), depth, width)
        .toAggregateExpression())

  /** Point-frequency estimate from a sketch built with the same
    * (depth, width): min over rows of the addressed cell — a stateless
    * expression over the broadcast sketch array, evaluated with the
    * SAME xxhash64(i, x) chain the aggregate wrote with.
    */
  def estimate(sk: Column, item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val cells = (0 until depth).map { i =>
      element_at(sk,
        (lit(i * width) + pmod(xxhash64(lit(i.toLong), item), lit(width.toLong)) + 1)
          .cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
