package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product — the hot-path
  * scalar of every similarity/ANN operator (SURVEY-adjacent training-data
  * pipeline surface; cosine over `Array[Float]` embeddings).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda per element through an
  * interpreted closure and allocate the zipped intermediate array per row
  * — outside whole-stage codegen. This expression generates a tight
  * primitive loop instead (doGenCode), keeping ANN scoring inside the
  * codegen'd stage. At 2000 vectors it is a few× faster; at 10⁸ vectors
  * per executor it is the difference between ANN being usable or not.
  *
  * Float-parity contract (must match the DuckDB oracle bit-for-bit):
  * each float element is widened to double BEFORE the multiply (a
  * float×float product is exact in double), and accumulation is
  * sequential left-to-right — the same partial-sum sequence as DuckDB's
  * `list_reduce((acc, v) -> acc + v)`.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloatArray(left); val rf = isFloatArray(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getA =
        if (isFloatArray(left)) s"(double) $av.getFloat($i)" else s"$av.getDouble($i)"
      val getB =
        if (isFloatArray(right)) s"(double) $bv.getFloat($i)" else s"$bv.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($av.numElements(), $bv.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $getA * $getB;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register `vec_dot` on the session's function registry (idempotent). */
  def register(spark: SparkSession): SparkSession = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
    spark
  }
}
