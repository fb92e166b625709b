package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout keys for write-side data clustering. */
object Layout {

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative dimensions — x in the even output bits, y in the
    * odd — so that sorting by the single z value keeps rows close in
    * BOTH dimensions close on disk. Writing a 100 TB table
    * range-partitioned + sorted by z gives min/max-stats pruning on
    * either dimension from one layout (the Delta/Iceberg Z-ORDER
    * mechanism); the key itself is this pure stateless expression —
    * the expensive part of z-ordering is the one range-sort the writer
    * already does, keyed by this column.
    *
    * Codegen-friendly: a fixed fold of shift/mask/add terms, no UDF.
    * Values above 2^bits wrap (only the low bits participate) — mask
    * or bucket wider domains first.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }
}
