package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Static kernel for nearest-mode assignment, shared by interpreted and
  * generated paths. Distance semantics = the built-in tree
  * `aggregate(zip_with(a, c, (x,y) -> if(x <=> y, 0, 1)), ...)`:
  * position-wise simple matching, null-safe (null == null matches),
  * length difference counts one mismatch per missing position. Ties go
  * to the LOWEST center index (numpy-argmin first-wins, SURVEY §3.1 R6).
  */
object HammingKernels {
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements(); val lb = b.numElements()
    val n = math.min(la, lb)
    var d = math.abs(la - lb)
    var i = 0
    while (i < n) {
      val na = a.isNullAt(i); val nb = b.isNullAt(i)
      if (na != nb) d += 1
      else if (!na && !a.getUTF8String(i).equals(b.getUTF8String(i))) d += 1
      i += 1
    }
    d
  }

  /** Returns struct(prediction, min_dist) over a center list. */
  def assign(features: ArrayData, centers: ArrayData): InternalRow = {
    val k = centers.numElements()
    var best = 0
    var bestD = Int.MaxValue
    var c = 0
    while (c < k) {
      val d = hamming(features, centers.getArray(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestD))
  }
}

/** Codegen'd fused nearest-mode assignment: one pass over the k centers
  * computing argmin + min distance together. The composed Column form
  * (`struct(argminIndex(d), array_min(d))`) duplicates the distance
  * array expression (computed twice per row) and every piece of it is a
  * CodegenFallback higher-order function — this expression is the inner
  * loop of every Lloyd iteration and of `KModesModel.transform`, so it
  * gets the native treatment like [[DotProduct]].
  */
case class HammingAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("prediction", IntegerType, nullable = false),
    StructField("min_dist", IntegerType, nullable = false)))
  override def prettyName: String = "graft_hamming_assign"

  override def nullSafeEval(f: Any, c: Any): Any =
    HammingKernels.assign(f.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, c) =>
      s"${ev.value} = graft.functions.HammingKernels.assign($f, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingAssign =
    copy(left = newLeft, right = newRight)
}

object HammingFunctions {
  /** struct(prediction int, min_dist int) — nearest center by Hamming. */
  def assign(features: Column, centers: Column): Column =
    Bridge.column(HammingAssign(Bridge.expression(features), Bridge.expression(centers)))
}
