package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dense-vector dot product.
  *
  * The `zip_with`/`aggregate` formulation in VectorFunctions is exact
  * but runs interpreted (higher-order functions are excluded from
  * whole-stage codegen), allocating a lambda frame per element. This
  * expression generates a tight Java loop instead — the preference-order
  * step up ((b) custom Expression) once profiling shows the lambda path
  * dominating, per SURVEY §4.
  *
  * Semantics BIT-MATCH the HOF form (and therefore the DuckDB oracle):
  * left-to-right fold of `(double)a[i] * (double)b[i]`; null result on
  * length mismatch or any null element (zip_with pads/propagates null
  * the same way).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: NumericType, _), ArrayType(_: NumericType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects two numeric arrays, got ${left.dataType} / ${right.dataType}")
    }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  private def getD(arr: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += getD(a, i, lt) * getD(b, i, rt)
      i += 1
    }
    acc
  }

  private def genGet(arr: String, i: String, t: NumericType): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new UnsupportedOperationException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Decimal-exact squared distance from a float vector to a centroid
  * (double array): sum over dims of CAST((v[i]-m[i])^2 AS
  * DECIMAL(18,12)), emitted as DOUBLE — one tight loop replacing the
  * 64-rows-per-(vector,centroid) posexplode fan-out + decimal SUM
  * aggregate (the round-11 "HOF/fan-out in a hot scan belongs in a
  * native expression" rule, applied to the round-12 #4/#5 heaviest
  * queries).
  *
  * Arithmetic BIT-MATCHES the aggregate form (and the DuckDB oracle's
  * dist CTE): each term rounds through java.math.BigDecimal.valueOf
  * (Double.toString shortest-form) setScale(12, HALF_UP) — the exact
  * Cast(double -> decimal(18,12)) path Spark's Decimal takes — and
  * accumulates as a scaled long (terms are <= 4x10^12 scaled units for
  * unit-norm inputs, 64 of them: no overflow anywhere near). The final
  * (double)acc / 1e12 is a correctly-rounded quotient of two exact
  * doubles, identical to Decimal(acc, 12).toDouble.
  */
case class SqDistToCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sqdist expects (array<float>, array<double>), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val diff = a.getFloat(i).toDouble - b.getDouble(i)
      acc += java.math.BigDecimal.valueOf(diff * diff)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    acc.toDouble / 1e12
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $diff = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $acc += java.math.BigDecimal.valueOf($diff * $diff)
         |      .setScale(12, java.math.RoundingMode.HALF_UP)
         |      .unscaledValue().longValueExact();
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ((double) $acc) / 1e12; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistToCentroid =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level entry point for the codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level entry point for the codegen'd decimal-exact squared
    * centroid distance. */
  def sqDistToCentroid(v: Column, means: Column): Column =
    ColumnBridge.column(
      SqDistToCentroid(ColumnBridge.expression(v), ColumnBridge.expression(means)))

  /** Column-level entry point for the codegen'd sign-bit LSH bucket. */
  def lshBucket(v: Column, planeOffset: Int, nPlanes: Int, dims: Int): Column =
    ColumnBridge.column(HyperplaneLshBucket(
      ColumnBridge.expression(v), planeOffset, nPlanes, dims))
}

/** Sign-bit LSH bucket over `nPlanes` deterministic hyperplanes — the
  * native form of the per-plane `aggregate(zip_with(v, coefs, _*_))`
  * fold (nPlanes interpreted lambda chains per row) as ONE codegen'd
  * call. Arithmetic BIT-MATCHES the HOF form and the DuckDB oracle:
  * per plane, a left-to-right fold of `(double)v[k] * coef[k]` from
  * 0.0, bit p set iff the projection >= 0. The coefficient matrix is
  * rebuilt from the same `VectorFunctions.planeCoefs` derivation at
  * deserialization (it is a deterministic function of (planeOffset,
  * nPlanes, dims) — nothing data-dependent ships with the plan).
  * A wrong-dims vector fails the query loudly (matching the HOF
  * form's raise_error); a null element nulls every plane's fold, so
  * every bit takes the otherwise-0 branch — bucket 0, exactly as the
  * `when` lands in the HOF form.
  */
case class HyperplaneLshBucket(child: Expression, planeOffset: Int,
    nPlanes: Int, dims: Int) extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 62 && dims >= 1)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects a numeric array, got $t")
  }

  @transient private lazy val coefs: Array[Array[Double]] =
    Array.tabulate(nPlanes)(p =>
      graft.functions.VectorFunctions.planeCoefs(planeOffset + p, dims).toArray)

  @transient private lazy val elem: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  private def getD(arr: ArrayData, i: Int): Double = elem match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"unsupported element type $other")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    if (n != dims) throw new IllegalStateException(
      s"hyperplaneLshBucket: expected $dims dims, got $n")
    var k = 0
    while (k < n) {
      if (a.isNullAt(k)) return 0L // null fold -> every bit's otherwise-0
      k += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val cs = coefs(p)
      var proj = 0.0
      k = 0
      while (k < dims) { proj += getD(a, k) * cs(k); k += 1 }
      if (proj >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("lshBucket", this,
        classOf[HyperplaneLshBucket].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}
