package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType}

/** Native float-vector dot product as a codegen-participating Catalyst
  * expression.
  *
  * The higher-order-function route (`aggregate(zip_with(...))`) allocates a
  * lambda-evaluated intermediate array per row and, with DECIMAL math, a
  * BigDecimal per element — ~300× slower than this tight primitive loop
  * over the UnsafeArrayData. Used as the cheap prefilter in similarity /
  * embedding-dedup pipelines: candidate pairs are cut down with this in
  * double precision, then the survivors are re-scored with exact DECIMAL
  * arithmetic for engine-exact output (see Dedup.dotDec).
  */
case class FloatVecDot(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    FloatVecDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.FloatVecDot.dot($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object FloatVecDot {
  /** Inputs must be dense, equal-length vectors; a corrupt row (length
    * mismatch from a truncated embedding, a null element) FAILS LOUDLY
    * instead of silently truncating to the shorter prefix or reading a
    * null slot as 0.0 — either would quietly skew every similarity score
    * downstream. */
  private[functions] def checkDense(a: ArrayData, b: ArrayData, op: String): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$op: vector length mismatch (${a.numElements()} vs ${b.numElements()})")
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"$op: null element at index $i")
      i += 1
    }
    n
  }

  /** Sequential-order double accumulation — deterministic per pair. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDense(a, b, "float_vec_dot")
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def float_vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Exact-DECIMAL float-vector dot product as a codegen-participating
  * expression — bit-identical to the declarative form
  * `aggregate(zip_with(a, b, (x,y) => dec(x)*dec(y)), 0, +)` with
  * `dec = cast to DECIMAL(12,6)` (see Dedup.dotDec's numeric contract),
  * but one tight loop instead of a lambda-interpreted intermediate array
  * and a per-element Catalyst cast. Element parity: Spark's
  * float→decimal(12,6) cast is BigDecimal.valueOf(toDouble) rounded
  * HALF_UP to scale 6; products are exact at scale 12 (25 digits < 38),
  * and the running sum stays exact at scale 12 (capped (30,12) in the
  * declarative form — never hit at |x| ≤ 10, dim 64). The DuckDB oracle
  * reproduces the same arithmetic, so scores hash-match.
  */
case class DecimalVecDot(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DecimalType(30, 12)
  override def prettyName: String = "decimal_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    DecimalVecDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.DecimalVecDot.dot($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object DecimalVecDot {
  /** r16 per-task optimization (guide §1.2 step 2): the BigDecimal loop
    * costs ~38 µs per 64-dim call — `BigDecimal.valueOf(double)` parses
    * `Double.toString` per ELEMENT, and the encode/truth pipelines run
    * hundreds of thousands of these per pass (pqCodesFor is N·M·K of
    * them). The fast path below computes the IDENTICAL value in scaled
    * long arithmetic: the element derivation
    * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` is reproduced as
    * `round(|x|·1e6)` whenever that rounding decision is provably
    * unambiguous — the double product `|x|·1e6` carries ≤ y·2⁻⁵² ≈ 4.4e-7
    * absolute error at the capped |y| ≤ 2e9, and the shortest-string
    * value `Double.toString` denotes differs from x by ≤ ulp, so when
    * the fractional part sits ≥ 1e-4 away from the HALF_UP tie every
    * representation rounds the same way. Inside the tie zone, out of
    * the magnitude cap, or on long overflow (products are exact in
    * long only up to |unscaled| ≤ 2e9 per side; the sum guards with
    * addExact), the call falls back to the original BigDecimal loop —
    * so the fast path changes latency, never the value. Bit-identity
    * incl. adversarial tie inputs is spec-locked (VectorOpsSpec). */
  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val n = FloatVecDot.checkDense(a, b, "decimal_vec_dot")
    try fastDot(a, b, n)
    catch { case _: ArithmeticException => slowDot(a, b, n) }
  }

  /** Unscaled long of `BigDecimal.valueOf(x).setScale(6, HALF_UP)`;
    * throws ArithmeticException when the decision is not provably
    * identical to the string-derivation path (tie zone / magnitude). */
  private def scaled6(x: Double): Long = {
    if (x == 0.0) return 0L
    val ax = math.abs(x)
    val y = ax * 1e6
    // |unscaled| cap keeps per-element products exact in a signed long
    if (y >= 2.0e9) throw new ArithmeticException("decimal fast path: range")
    val f = math.floor(y)
    val r = y - f
    // ambiguity bound: the double product carries ≤ 4.4e-7 absolute
    // error at the 2e9 cap and the shortest-string value differs from x
    // by ≤ 4.5e-7 scaled — 1e-4 is a 100× margin over both, and narrow
    // enough that random corpora rarely defer (a 1e-2 zone deferred ~90%
    // of 64-dim calls, measured)
    if (math.abs(r - 0.5) <= 1e-4)
      throw new ArithmeticException("decimal fast path: tie zone")
    val u = (if (r > 0.5) f + 1 else f).toLong
    if (x < 0) -u else u
  }

  private def fastDot(a: ArrayData, b: ArrayData, n: Int): Decimal = {
    var sum = 0L
    var i = 0
    while (i < n) {
      sum = Math.addExact(sum, Math.multiplyExact(
        scaled6(a.getFloat(i).toDouble), scaled6(b.getFloat(i).toDouble)))
      i += 1
    }
    // scale-12 unscaled sum; (30,12) writes via the byte-array path, so
    // the stored bytes equal the BigDecimal branch's exactly
    Decimal(java.math.BigDecimal.valueOf(sum, 12), 30, 12)
  }

  /** The original element-exact BigDecimal loop — the semantics anchor
    * the fast path must match (also the spec's reference). */
  private[graft] def slowDot(a: ArrayData, b: ArrayData, n: Int): Decimal = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val xa = java.math.BigDecimal.valueOf(a.getFloat(i).toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      val xb = java.math.BigDecimal.valueOf(b.getFloat(i).toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      acc = acc.add(xa.multiply(xb))
      i += 1
    }
    Decimal(acc.setScale(12), 30, 12)
  }

  def decimal_vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DecimalVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Exact-DECIMAL dot product over SLOTTED series vectors — fixed-length
  * arrays with NULLABLE elements where `null` means "slot absent" (the
  * q44-family 24-slot hour-of-day profile). Returns NULL when NO slot is
  * present on both sides; otherwise the BigDecimal-exact sum of the
  * present-slot products at scale 2s.
  *
  * This is the q44/q44b scoring and assignment contract in one codegen
  * primitive: the relational form computed the same dot by inner-joining
  * profiles on `hour` (pair exists ⇔ ≥1 common hour, dot = Σ over common
  * hours) — but that explodes every candidate ×24 rows across exchanges
  * and a hash aggregate, the measured spill site of q44b's 100× study
  * point (SCALETREND r14). Here the dot is computed WHERE THE PAIR IS
  * GENERATED, in one tight loop over the two UnsafeArrayData. NULL-return
  * (not zero) preserves the join form's answer SET exactly: a pair with
  * no common present hour was never scored, and a present-but-zero sum
  * still counts as presence. Arithmetic parity with the DuckDB oracle:
  * elements are DECIMAL(p,s) read at their declared scale, products are
  * exact at scale 2s, and java.math.BigDecimal addition is exact at any
  * precision — identical to DuckDB's `sum(pa.v * pb.v)` over the hour
  * join, so the final double cosines hash-match bit-for-bit (no Spark
  * Add-operator precision-loss rounding, which a declarative
  * `aggregate(zip_with(...))` fold WOULD pay at (38,12)+(37,12)).
  */
case class DecimalSeriesDot(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_series_dot"

  private lazy val elem: DecimalType = a.dataType match {
    case ArrayType(dt: DecimalType, _) => dt
    case _ => DecimalType(18, 6) // unreachable past checkInputDataTypes
  }

  override def dataType: DataType = DecimalType(38, elem.scale * 2)

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(l: DecimalType, _), ArrayType(r: DecimalType, _)) if l == r =>
      // 2p digits per product plus 2 digits of accumulation headroom
      // (≤100 slots) must fit DECIMAL(38), or a legal-at-analysis input
      // could overflow the exact sum at RUNTIME — reject here instead
      if (l.precision * 2 + 2 <= 38) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: element precision ${l.precision} needs " +
          s"${l.precision * 2 + 2} digits (product + accumulation " +
          "headroom), exceeding DECIMAL(38)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<decimal(p,s)> of the SAME type, got " +
        s"(${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    DecimalSeriesDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData],
      elem.precision, elem.scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      ${ev.value} = graft.functions.DecimalSeriesDot.dot(
        $x, $y, ${elem.precision}, ${elem.scale});
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object DecimalSeriesDot {
  /** Null when no slot is present on both sides; exact otherwise. Lengths
    * may differ (a shorter array simply has no slots past its end).
    * Exactness envelope: checkInputDataTypes reserves 2 digits of
    * accumulation headroom over the 2p-digit products, which covers up
    * to 100 present slots of worst-case elements; beyond that the
    * DECIMAL(38) result can overflow and the Decimal ctor fails loudly
    * rather than rounding. */
  def dot(a: ArrayData, b: ArrayData, p: Int, s: Int): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    // r16 fast path: elements are compact decimals (p ≤ 18 guaranteed by
    // checkInputDataTypes), so the exact product/sum is plain integer
    // arithmetic on unscaled longs — no BigDecimal per slot. multiplyExact
    // /addExact overflow (unscaled magnitudes the fixture corpora never
    // reach) falls back to the original BigDecimal loop; values are
    // IDENTICAL by construction (same integers, same scale), spec-locked.
    try fastDot(a, b, p, s, n)
    catch { case _: ArithmeticException => slowDot(a, b, p, s, n) }
  }

  private def fastDot(a: ArrayData, b: ArrayData, p: Int, s: Int,
      n: Int): Decimal = {
    var sum = 0L
    var present = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        sum = Math.addExact(sum, Math.multiplyExact(
          a.getDecimal(i, p, s).toUnscaledLong,
          b.getDecimal(i, p, s).toUnscaledLong))
        present = true
      }
      i += 1
    }
    if (!present) null
    else Decimal(java.math.BigDecimal.valueOf(sum, 2 * s), 38, 2 * s)
  }

  private[graft] def slowDot(a: ArrayData, b: ArrayData, p: Int, s: Int,
      n: Int): Decimal = {
    var acc: java.math.BigDecimal = null
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val prod = a.getDecimal(i, p, s).toJavaBigDecimal
          .multiply(b.getDecimal(i, p, s).toJavaBigDecimal)
        acc = if (acc == null) prod else acc.add(prod)
      }
      i += 1
    }
    if (acc == null) null
    else {
      val scaled = acc.setScale(2 * s)
      if (scaled.precision > 38)
        throw new ArithmeticException(
          s"decimal_series_dot: exact sum needs ${scaled.precision} " +
            "digits > DECIMAL(38) — the 2-digit accumulation headroom " +
            s"reserved at analysis covers ≤100 worst-case DECIMAL($p,$s) " +
            "present slots; reduce element precision or slot count")
      Decimal(scaled, 38, 2 * s)
    }
  }

  def decimal_series_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DecimalSeriesDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
