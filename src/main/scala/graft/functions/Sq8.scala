package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Int8 scalar quantization (SQ8) of an embedding vector as native
  * codegen'd Catalyst expressions — the standard first compression step
  * for a 100 TB-scale vector store (float32 → uint8 codes is 4× less
  * memory and bandwidth; recall loss is bounded by the per-vector grid
  * step, which [[Sq8Stats]] accounts for exactly).
  *
  * Model: per-vector affine grid with 256 levels. With
  * `mn = min(x)`, `mx = max(x)`, `scale = (mx - mn) / 255.0`:
  *
  *   code_i  = min(floor((x_i - mn) / scale), 255)      (0 when scale=0)
  *   x̂_i     = mn + code_i * scale
  *
  * Every arithmetic step is IEEE double in the order written above, so
  * DuckDB replays the grid bit-for-bit with
  * `least(floor((x - mn) / scale), 255.0)` inside `list_transform` —
  * both quantization queries are oracle-exact, not rows-only.
  *
  * Why native expressions instead of the composable HOF pipeline
  * (`transform` over min/max aliases): lambda bodies are interpreted per
  * element and CollapseProject re-inlines the outer `array_min`/
  * `array_max` aliases into them, turning a one-pass kernel into
  * O(dims²) work per row (the ShingleNGrams trap). These are tight
  * primitive loops inside whole-stage codegen; the min/max pass runs
  * once per vector.
  *
  * Null semantics: NULL on empty arrays, any null element, or any
  * non-finite element (strict, like [[DotProduct]] — see
  * [[Sq8.isInvalid]] for why NaN/Inf are refused rather than coded).
  */
private[functions] sealed trait Sq8Expr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
}

/** Quantize-dequantize round trip: array<double> → array<double> of grid
  * values. Feeding the reconstructed vectors to the cosine kernel gives
  * the quantized ANN path (`emb_ann_sq`) with the exact arithmetic a
  * code-resident index would see. */
case class Sq8Roundtrip(child: Expression) extends Sq8Expr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_roundtrip"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (Sq8.isInvalid(x)) null else Sq8.roundtrip(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |if (graft.functions.Sq8.isInvalid($a)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.Sq8.roundtrip($a);
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Sq8Roundtrip =
    copy(child = newChild)
}

/** One-pass reconstruction-error accounting: array<double> →
  * `[mn, mx, sse, max_abs_err]` (fixed 4-wide array<double>; callers
  * `element_at` the fields). `sse` accumulates err² left-to-right in
  * array order — the same sequential sum as DuckDB's
  * `list_dot_product(err, err)` — so the stats replay bit-for-bit. */
case class Sq8Stats(child: Expression) extends Sq8Expr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_stats"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (Sq8.isInvalid(x)) null else Sq8.stats(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |if (graft.functions.Sq8.isInvalid($a)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.Sq8.stats($a);
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Sq8Stats =
    copy(child = newChild)
}

/** Encode to storable int8 codes: array<double> → array<byte> where
  * byte = code − 128 (the uint8 grid code shifted into signed-byte
  * range — 4× smaller than float32 at rest and on the wire). The grid
  * params ride alongside as plain columns (see Similarity.sq8Index);
  * [[Sq8Decode]] inverts exactly. */
case class Sq8Codes(child: Expression) extends Sq8Expr {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq8_codes"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (Sq8.isInvalid(x)) null else Sq8.codes(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |if (graft.functions.Sq8.isInvalid($a)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.Sq8.codes($a);
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Sq8Codes =
    copy(child = newChild)
}

/** Decode stored codes back to grid values:
  * (codes: array<byte>, mn: double, scale: double) → array<double>,
  * x̂_i = mn + (byte_i + 128) · scale. With (mn, scale) taken from the
  * same vector's grid, `Sq8Decode(Sq8Codes(e), mn, scale)` equals
  * `Sq8Roundtrip(e)` bit-for-bit (spec-pinned) — the decode a
  * code-resident index performs per candidate at search time. */
case class Sq8Decode(codes: Expression, mn: Expression, scale: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = codes
  override def second: Expression = mn
  override def third: Expression = scale
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, mn.dataType, scale.dataType) match {
      case (ArrayType(ByteType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, m, s) => TypeCheckResult.TypeCheckFailure(
        s"sq8_decode requires (array<tinyint>, double, double), got " +
          s"(${c.catalogString}, ${m.catalogString}, ${s.catalogString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_decode"

  override protected def nullSafeEval(c: Any, m: Any, s: Any): Any = {
    val x = c.asInstanceOf[ArrayData]
    if (Sq8.hasNullElement(x)) null
    else Sq8.decode(x, m.asInstanceOf[Double], s.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, m, s) => s"""
      |if (graft.functions.Sq8.hasNullElement($c)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.Sq8.decode($c, $m, $s);
      |}""".stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8Decode =
    copy(codes = newFirst, mn = newSecond, scale = newThird)
}

object Sq8 {
  /** Empty array, any null element, or any NON-FINITE element ⇒ NULL
    * (strict). Non-finite values have no grid code: the roundtrip
    * would propagate NaN while the int8 code path would have to invent
    * a finite byte for it — a silent mn-substitution on decode. A
    * vector with NaN/Inf dimensions is corrupt input; refusing it
    * keeps decode∘codes ≡ roundtrip an identity on every accepted
    * vector. */
  def isInvalid(a: ArrayData): Boolean = {
    val n = a.numElements()
    if (n == 0) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || !java.lang.Double.isFinite(a.getDouble(i)))
        return true
      i += 1
    }
    false
  }

  /** (mn, mx) of the vector; the 256-level grid step is
    * `(mx - mn) / 255.0`, zero for constant vectors (the roundtrip then
    * reproduces `mn` exactly, zero error). */
  private def minMax(x: Array[Double]): (Double, Double) = {
    var mn = x(0); var mx = x(0)
    var i = 1
    while (i < x.length) {
      val v = x(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (mn, mx)
  }

  /** The grid code as a double in [0, 255] — single definition shared
    * by the roundtrip, stats, and int8-code paths so they can never
    * diverge. Inputs are pre-validated finite (isInvalid), so the code
    * is always an exact small integer. */
  private def codeOf(x: Double, mn: Double, scale: Double): Double =
    if (scale == 0.0) 0.0
    else math.min(math.floor((x - mn) / scale), 255.0)

  private def dequantized(x: Double, mn: Double, scale: Double): Double =
    mn + codeOf(x, mn, scale) * scale

  /** Shared by interpreted eval and generated code. */
  def roundtrip(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    val (mn, mx) = minMax(x)
    val scale = (mx - mn) / 255.0
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = dequantized(x(i), mn, scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by interpreted eval and generated code. */
  def stats(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    val (mn, mx) = minMax(x)
    val scale = (mx - mn) / 255.0
    var sse = 0.0
    var mae = 0.0
    var i = 0
    while (i < x.length) {
      val err = x(i) - dequantized(x(i), mn, scale)
      sse += err * err
      val ae = math.abs(err)
      if (ae > mae) mae = ae
      i += 1
    }
    new GenericArrayData(Array(mn, mx, sse, mae))
  }

  /** Null elements ⇒ NULL (decode input; empty arrays are legal here —
    * an empty code list decodes to an empty vector). */
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Shared by interpreted eval and generated code. */
  def codes(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    val (mn, mx) = minMax(x)
    val scale = (mx - mn) / 255.0
    val out = new Array[Byte](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = (codeOf(x(i), mn, scale).toInt - 128).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by interpreted eval and generated code. */
  def decode(c: ArrayData, mn: Double, scale: Double): ArrayData = {
    val n = c.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = mn + (c.getByte(i) + 128).toDouble * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  def roundtripColumn(a: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      Sq8Roundtrip(org.apache.spark.sql.graft.Shims.expression(a)))

  def statsColumn(a: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      Sq8Stats(org.apache.spark.sql.graft.Shims.expression(a)))

  def codesColumn(a: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      Sq8Codes(org.apache.spark.sql.graft.Shims.expression(a)))

  def decodeColumn(codes: Column, mn: Column, scale: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      Sq8Decode(org.apache.spark.sql.graft.Shims.expression(codes),
        org.apache.spark.sql.graft.Shims.expression(mn),
        org.apache.spark.sql.graft.Shims.expression(scale)))
}
