package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Engine-portable fixed-point integer math.
  *
  * [[fracLog2Steps]] renders ⌊2^f · log2(a/b)⌋ (to within the last
  * fixed-point digit) as a DETERMINISTIC integer recurrence — the
  * missing precision between [[graft.operators.LanguageModel]]'s
  * whole-bit floor-log2 (±1 bit per term — enough for surprisal
  * ranking, too coarse for likelihood-RATIO scores whose signal lives
  * in fractions of a bit) and a float log2 (not portable across
  * engines: libm ULPs). The contract is NOT "mathematically exact
  * log2"; it is "the same integer on every engine": every step is
  * integer shift/multiply/compare, so Spark and any ANSI-ish oracle
  * that runs the same steps agree bit-for-bit, and the result is
  * within 2^-f + ~f·2^-30 bits of the true log2 (renormalization
  * keeps mantissas at 31 bits; each squaring doubles then re-caps).
  *
  * Algorithm (classic fixed-point log2 by repeated squaring):
  * normalize r = a/b into [1,2) tracking the integer exponent e, then
  * f times: renormalize p,q to ≤31 bits, square the ratio, emit a
  * fraction bit if r² ≥ 2 (halving back into [1,2)). Inputs must be
  * in [1, 2^61) so every intermediate fits a signed 64-bit long
  * (p ≤ 2^62 pre-renorm, squares ≤ 2^62, 2·q² < 2^63) — 2^61 is
  * ~2.3e18 token counts, far past any corpus.
  *
  * The SAME step list feeds the Spark plan (via expr) and the DuckDB
  * oracle (via a CTE chain with lateral aliases) — parameterized only
  * by the dialect's shift syntax, so the two sides cannot drift.
  */
object IntMath {

  /** Step list (colName -> sqlExpr, each may reference earlier names)
    * computing `pfx`out = ⌊2^fracBits · log2(a/b)⌋-style fixed-point
    * ratio log. Returns (steps, outColName).
    *
    * `shl`/`shr` render the dialect's non-negative shift (shift
    * amounts are clamped ≥ 0 in the steps, so no branch ever shifts
    * negatively).
    */
  def fracLog2Steps(a: String, b: String, pfx: String, fracBits: Int,
                    shl: (String, String) => String,
                    shr: (String, String) => String): (Seq[(String, String)], String) = {
    require(fracBits >= 1 && fracBits <= 20,
      s"fracBits must be in [1,20], got $fracBits")
    def blen(x: String) = s"length(bin($x))"
    val steps = Seq.newBuilder[(String, String)]
    // exponent estimate and normalization of r = a/b into [1,2):
    // shifts are split into two non-negative amounts so neither
    // dialect ever sees a negative shift count
    steps += s"${pfx}e0" -> s"CAST(${blen(a)} - ${blen(b)} AS BIGINT)"
    steps += s"${pfx}p0" -> shl(s"CAST($a AS BIGINT)", s"greatest(-${pfx}e0, 0)")
    steps += s"${pfx}q0" -> shl(s"CAST($b AS BIGINT)", s"greatest(${pfx}e0, 0)")
    steps += s"${pfx}lt" -> s"CASE WHEN ${pfx}p0 < ${pfx}q0 THEN 1 ELSE 0 END"
    steps += s"${pfx}e" -> s"${pfx}e0 - ${pfx}lt"
    steps += s"${pfx}p_0" -> s"${pfx}p0 * (1 + ${pfx}lt)"
    steps += s"${pfx}q_0" -> s"${pfx}q0"
    steps += s"${pfx}acc_0" -> "CAST(0 AS BIGINT)"
    (1 to fracBits).foreach { j =>
      val (p, q, acc) = (s"${pfx}p_${j - 1}", s"${pfx}q_${j - 1}", s"${pfx}acc_${j - 1}")
      steps += s"${pfx}s$j" ->
        s"greatest(greatest(${blen(p)}, ${blen(q)}) - 31, 0)"
      steps += s"${pfx}pr$j" -> shr(p, s"${pfx}s$j")
      steps += s"${pfx}qr$j" -> shr(q, s"${pfx}s$j")
      steps += s"${pfx}ps$j" -> s"${pfx}pr$j * ${pfx}pr$j"
      steps += s"${pfx}qs$j" -> s"${pfx}qr$j * ${pfx}qr$j"
      steps += s"${pfx}bit$j" ->
        s"CASE WHEN ${pfx}ps$j >= 2 * ${pfx}qs$j THEN 1 ELSE 0 END"
      steps += s"${pfx}acc_$j" -> s"$acc * 2 + ${pfx}bit$j"
      steps += s"${pfx}p_$j" -> s"${pfx}ps$j"
      steps += s"${pfx}q_$j" -> s"${pfx}qs$j * (1 + ${pfx}bit$j)"
    }
    steps += s"${pfx}out" ->
      s"${pfx}e * ${1L << fracBits} + ${pfx}acc_$fracBits"
    (steps.result(), s"${pfx}out")
  }

  /** Spark-dialect steps (shiftleft/shiftright SQL functions). */
  def sparkSteps(a: String, b: String, pfx: String,
                 fracBits: Int = 10): (Seq[(String, String)], String) =
    fracLog2Steps(a, b, pfx, fracBits,
      (x, s) => s"shiftleft($x, CAST($s AS INT))",
      (x, s) => s"shiftright($x, CAST($s AS INT))")

  /** DuckDB-dialect steps (<< / >> operators). */
  def duckSteps(a: String, b: String, pfx: String,
                fracBits: Int = 10): (Seq[(String, String)], String) =
    fracLog2Steps(a, b, pfx, fracBits,
      (x, s) => s"(($x) << ($s))",
      (x, s) => s"(($x) >> ($s))")

  /** Apply the recurrence on a DataFrame: adds `out` =
    * fixed-point log2(aCol/bCol), drops every intermediate. aCol and
    * bCol must already be columns ON `df` (referenced by name in the
    * generated exprs).
    */
  def fracLog2Col(df: DataFrame, aName: String, bName: String, out: String,
                  fracBits: Int = 10): DataFrame = {
    val (steps, outName) = sparkSteps(aName, bName, s"__${out}_", fracBits)
    // Batched Projects with LATERAL COLUMN ALIASES (each step may
    // reference earlier step names; the analyzer splits a chain into
    // the same nested Projects a withColumn fold builds) instead of
    // ~90 withColumn rounds: every withColumn constructs a Dataset and
    // re-runs the analyzer over the accumulated plan, which made
    // DRIVER plan construction the dominant cost of the small-data
    // gates (measured r16: q241 spent 2.5 s of 4.1 s total building
    // this chain twice, against 0.2 s of task time). Steps are grouped
    // ~45 per select because LCA resolution peels about one alias
    // level per analyzer iteration — a single ~90-deep select hits the
    // default 100-iteration Resolution cap. Executed plan shape is
    // unchanged — only the number of analysis passes drops (~2 vs ~90).
    val projected = steps.grouped(45).foldLeft(df) { (d, group) =>
      d.selectExpr(Seq("*") ++ group.map { case (n, e) => s"($e) AS $n" }: _*)
    }
    val temps = steps.map(_._1).filter(_ != outName)
    projected.withColumnRenamed(outName, out).drop(temps: _*)
  }

  /** Scala reference implementation (specs compare the Spark column
    * against this; the oracle gate compares engines end-to-end).
    */
  def fracLog2Ref(a: Long, b: Long, fracBits: Int = 10): Long = {
    require(a >= 1 && b >= 1 && a < (1L << 61) && b < (1L << 61),
      s"inputs must be in [1, 2^61), got ($a, $b)")
    val e0 = (64 - java.lang.Long.numberOfLeadingZeros(a)) -
      (64 - java.lang.Long.numberOfLeadingZeros(b))
    var p = if (e0 < 0) a << -e0 else a
    var q = if (e0 >= 0) b << e0 else b
    var e = e0.toLong
    if (p < q) { e -= 1; p <<= 1 }
    var acc = 0L
    var j = 0
    while (j < fracBits) {
      val s = math.max(
        math.max(64 - java.lang.Long.numberOfLeadingZeros(p),
          64 - java.lang.Long.numberOfLeadingZeros(q)) - 31, 0)
      p >>= s; q >>= s
      p = p * p; q = q * q
      if (p >= 2 * q) { acc = acc * 2 + 1; q *= 2 } else acc *= 2
      j += 1
    }
    e * (1L << fracBits) + acc
  }
}
