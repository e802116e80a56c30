package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

/** Half-precision element types (SURVEY §1.2 — reference lib/float16.h,
  * lib/bfloat16.h): Spark has no 16-bit float type, so f16/bf16 vectors are
  * stored as their raw bits in `ARRAY<SMALLINT>` and decoded to
  * `ARRAY<FLOAT>` by these expressions (SURVEY §7: acceptable because the
  * reference's kernels widen to f32 before accumulating anyway,
  * distance/euclidean.h:88-105).
  *
  * - IEEE 754 binary16: 1 sign, 5 exponent, 10 mantissa bits; JDK 20+
  *   provides the exact conversion (`Float.float16ToFloat`).
  * - bfloat16: the top 16 bits of a binary32 — decode is a 16-bit shift.
  */
abstract class HalfDecodeBase extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<SMALLINT> raw bits, got ${t.catalogString}")
  }

  protected def decodeOne(bits: Short): Float
  /** Java expression decoding short variable `b` to a float. */
  protected def javaDecode(b: String): String

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = decodeOne(arr.getShort(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  short $b = $c.getShort($i);
         |  $out[$i] = ${javaDecode(b)};
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
}

/** IEEE binary16 conversions (JDK 20 has these built in; Java 17 doesn't).
  * Static forwarders make the methods callable from generated code. */
object Binary16 {
  def halfToFloat(bits: Short): Float = {
    val b = bits & 0xffff
    val sign = (b & 0x8000) << 16
    val exp = (b >>> 10) & 0x1f
    val mant = b & 0x3ff
    if (exp == 0x1f)
      java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    else if (exp != 0)
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    else if (mant == 0) java.lang.Float.intBitsToFloat(sign)
    else { // subnormal: mant · 2⁻²⁴
      val f = mant * 5.9604645e-8f
      if (sign != 0) -f else f
    }
  }

  def floatToHalf(fv: Float): Short = {
    val f = java.lang.Float.floatToIntBits(fv)
    val sign = (f >>> 16) & 0x8000
    val absf = f & 0x7fffffff
    if (absf >= 0x7f800000) // inf / nan
      (sign | (if (absf > 0x7f800000) 0x7e00 else 0x7c00)).toShort
    else if (absf >= 0x477ff000) (sign | 0x7c00).toShort // ≥ 65520 → inf
    else if (absf >= 0x38800000) { // normal half range
      var h = sign | (((absf >>> 23) - 112) << 10) | ((absf >>> 13) & 0x3ff)
      val rest = absf & 0x1fff // round-to-nearest-even on dropped 13 bits
      if (rest > 0x1000 || (rest == 0x1000 && (h & 1) == 1)) h += 1
      h.toShort
    } else { // subnormal or zero: units of 2⁻²⁴ (carry into exp=1 is valid)
      val q = Math.round(java.lang.Math.abs(fv) * (1 << 24).toFloat)
      (sign | q).toShort
    }
  }
}

/** IEEE binary16 raw bits → float32. */
case class Float16Decode(child: Expression) extends HalfDecodeBase {
  override def prettyName: String = "float16_decode"
  override protected def decodeOne(bits: Short): Float =
    Binary16.halfToFloat(bits)
  override protected def javaDecode(b: String): String =
    s"graft.functions.Binary16.halfToFloat($b)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bfloat16 raw bits → float32 (bits << 16 reinterpreted). */
case class BFloat16Decode(child: Expression) extends HalfDecodeBase {
  override def prettyName: String = "bfloat16_decode"
  override protected def decodeOne(bits: Short): Float =
    java.lang.Float.intBitsToFloat((bits & 0xffff) << 16)
  override protected def javaDecode(b: String): String =
    s"java.lang.Float.intBitsToFloat(($b & 0xffff) << 16)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

abstract class HalfEncodeBase extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
  }

  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def encodeOne(v: Float): Short

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i) else arr.getDouble(i).toFloat
      out(i) = encodeOne(v); i += 1
    }
    new GenericArrayData(out)
  }
}

/** float32/64 → binary16 raw bits (round-to-nearest-even, JDK
  * floatToFloat16) — the S7 converting-ingest path
  * (convert_fvecs_to_float16, python_bindings.cpp:61-72). */
case class Float16Encode(child: Expression) extends HalfEncodeBase {
  override def prettyName: String = "float16_encode"
  override protected def encodeOne(v: Float): Short =
    Binary16.floatToHalf(v)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** float32/64 → bfloat16 raw bits (truncation, the reference's bf16
  * narrowing). */
case class BFloat16Encode(child: Expression) extends HalfEncodeBase {
  override def prettyName: String = "bfloat16_encode"
  override protected def encodeOne(v: Float): Short =
    ((java.lang.Float.floatToIntBits(v) >>> 16) & 0xffff).toShort
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HalfFloat {

  def float16Decode(raw: Column): Column =
    Bridge.column(Float16Decode(Bridge.expression(raw)))

  def bfloat16Decode(raw: Column): Column =
    Bridge.column(BFloat16Decode(Bridge.expression(raw)))

  def float16Encode(vec: Column): Column =
    Bridge.column(Float16Encode(Bridge.expression(vec)))

  def bfloat16Encode(vec: Column): Column =
    Bridge.column(BFloat16Encode(Bridge.expression(vec)))
}
