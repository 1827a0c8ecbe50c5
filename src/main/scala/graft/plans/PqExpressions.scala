package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization encoder.
  *
  * The HOF formulation (16 sub-centroids x 8 subspaces, each an
  * `aggregate(zip_with(slice(...)))`) evaluates 128 interpreted lambda
  * folds per row. This expression runs the whole codebook in ONE tight
  * generated loop per row — the same (b)-custom-Expression step as
  * DotProduct, taken when profiling showed the PQ queries' scan stage
  * dominated by lambda frames.
  *
  * Semantics BIT-MATCH the HOF form and the DuckDB oracle:
  * per sub-centroid, squared-L2 folds left-to-right from 0.0 over
  * `((double)x[m*8+i] - c)^2`; argmin keeps the LOWEST j on ties
  * (ORDER BY dist, j); the reconstruction error sums the 8 best
  * distances in subspace order. Returns struct(code BIGINT, err DOUBLE)
  * with code = Σ bestJ(m) << (4m); null if the input is not exactly
  * subspaces*dims elements or any element is null.
  */
case class PqEncode(child: Expression, cents: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val nSub = cents.length            // subspaces (8)
  private val nCent = cents.head.length      // centroids per subspace (16)
  private val nDim = cents.head.head.length  // dims per subspace (8)

  /** Flat [m][j][i] codebook, addReferenceObj-able. */
  private lazy val flat: Array[Double] =
    cents.flatten.flatten.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_encode expects a numeric array, got $t")
  }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

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

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != nSub * nDim) return null
    val t = elemType
    var code = 0L
    var err = 0.0
    var m = 0
    while (m < nSub) {
      var bestD = Double.MaxValue
      var bestJ = 0
      var j = 0
      while (j < nCent) {
        var acc = 0.0
        var i = 0
        while (i < nDim) {
          if (a.isNullAt(m * nDim + i)) return null
          val d = getD(a, m * nDim + i, t) - flat((m * nCent + j) * nDim + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j }
        j += 1
      }
      code |= bestJ.toLong << (4 * m)
      err += bestD
      m += 1
    }
    InternalRow(code, err)
  }

  private def genGet(arr: String, i: String): String = elemType match {
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
    nullSafeCodeGen(ctx, ev, a => {
      val cref = ctx.addReferenceObj("pqCents", flat, "double[]")
      val code = ctx.freshName("code")
      val err = ctx.freshName("err")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != ${nSub * nDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $code = 0L; double $err = 0.0;
         |  for (int $m = 0; $m < $nSub && !${ev.isNull}; $m++) {
         |    double $bestD = Double.MAX_VALUE; int $bestJ = 0;
         |    for (int $j = 0; $j < $nCent; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $nDim; $i++) {
         |        if ($a.isNullAt($m * $nDim + $i)) { ${ev.isNull} = true; break; }
         |        double $d = ${genGet(a, s"$m * $nDim + $i")}
         |          - $cref[($m * $nCent + $j) * $nDim + $i];
         |        $acc += $d * $d;
         |      }
         |      if (${ev.isNull}) break;
         |      if ($acc < $bestD) { $bestD = $acc; $bestJ = $j; }
         |    }
         |    $code |= ((long) $bestJ) << (4 * $m);
         |    $err += $bestD;
         |  }
         |  if (!${ev.isNull}) {
         |    Object[] $row = new Object[] { $code, $err };
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqExpressions {
  /** Column-level entry point: struct(code, err) for a row's embedding
    * against a literal codebook.
    */
  def pqEncode(v: Column, cents: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), cents))

  /** Ids of the `take` nearest trained-quantizer centroids for a row's
    * (quantized) vector, ranked by (squared-L2 distance, cid).
    */
  def centroidRanks(v: Column, cents: Seq[(Long, Seq[Double])], take: Int): Column =
    ColumnBridge.column(
      CentroidRanks(ColumnBridge.expression(v), cents.map(_._1), cents.map(_._2), take))
}

/** Native trained-quantizer ranker: the ids of the `take` nearest
  * centroids by (squared-L2, cid), as one tight generated loop per row.
  *
  * Replaces the HOF formulation (sort_array over a transform of the
  * k-centroid literal, each distance an aggregate(zip_with) fold) that
  * profiling showed dominating the kmeans/IVF/semdedup scan stages:
  * higher-order functions never enter whole-stage codegen, so k=128
  * centroids cost 128 interpreted lambda frames PER ROW. Same
  * (b)-custom-Expression step as PqEncode.
  *
  * Semantics BIT-MATCH the HOF form and the DuckDB oracle: per
  * centroid, squared-L2 folds left-to-right from 0.0 over
  * `((double)x[i] - c[i])^2` (the exact IEEE order of
  * `list_sum(list_transform(...))`); ranking is ORDER BY dist, cid
  * via `take` selection passes (ties on dist take the lower cid).
  * take=1 is the k-means assignment; take=nprobe the IVF probe list.
  * Null iff the input is not exactly `dim` elements or any element
  * is null.
  */
case class CentroidRanks(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Double]], take: Int) extends UnaryExpression {

  private val k = cents.length
  private val dim = cents.head.length
  require(take >= 1 && take <= k)

  /** Flat [j][i] centroid matrix + id table, addReferenceObj-able. */
  private lazy val flat: Array[Double] = cents.flatten.toArray
  private lazy val idArr: Array[Long] = cids.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_centroid_ranks expects a numeric array, got $t")
  }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

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

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val t = elemType
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      x(i) = getD(a, i, t)
      i += 1
    }
    val dist = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      i = 0
      while (i < dim) {
        val d = x(i) - flat(j * dim + i)
        acc += d * d
        i += 1
      }
      dist(j) = acc
      j += 1
    }
    val out = new Array[Long](take)
    val used = new Array[Boolean](k)
    var n = 0
    while (n < take) {
      var bj = -1
      j = 0
      while (j < k) {
        if (!used(j) && (bj < 0 || dist(j) < dist(bj) ||
            (dist(j) == dist(bj) && idArr(j) < idArr(bj)))) bj = j
        j += 1
      }
      used(bj) = true
      out(n) = idArr(bj)
      n += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cref = ctx.addReferenceObj("centFlat", flat, "double[]")
      val iref = ctx.addReferenceObj("centIds", idArr, "long[]")
      val x = ctx.freshName("x")
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bj = ctx.freshName("bj")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $x = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $x[$i] = ${genGet(a, i)};
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $dist = new double[$k];
         |    for (int $j = 0; $j < $k; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        double $d = $x[$i] - $cref[$j * $dim + $i];
         |        $acc += $d * $d;
         |      }
         |      $dist[$j] = $acc;
         |    }
         |    boolean[] $used = new boolean[$k];
         |    long[] $out = new long[$take];
         |    for (int $n = 0; $n < $take; $n++) {
         |      int $bj = -1;
         |      for (int $j = 0; $j < $k; $j++) {
         |        if (!$used[$j] && ($bj < 0 || $dist[$j] < $dist[$bj] ||
         |            ($dist[$j] == $dist[$bj] && $iref[$j] < $iref[$bj]))) $bj = $j;
         |      }
         |      $used[$bj] = true;
         |      $out[$n] = $iref[$bj];
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  private def genGet(arr: String, i: String): String = elemType match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new UnsupportedOperationException(s"unsupported element type $other")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidRanks =
    copy(child = newChild)
}
