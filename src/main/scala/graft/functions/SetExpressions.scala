package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[SortedIntersectCount]]: two-pointer merge over
  * two string arrays that are SORTED (binary UTF8 order — what
  * `array_sort` produces for strings) and DISTINCT. One linear walk, no
  * per-row hash-set allocation.
  */
object SetKernels {
  def intersectCountSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** |A ∩ B| for sorted distinct string arrays, codegen'd.
  *
  * The dedup family's exact-verify loop computes Jaccard for every
  * candidate pair; the built-in `array_intersect`/`array_union` pair
  * builds two hash sets PER PAIR (and `array_union` materializes the
  * union array only to take its size). With |A∪B| = |A| + |B| − |A∩B|
  * on distinct inputs, one merge-walk replaces both. Caller contract:
  * inputs are sorted (binary order) and duplicate-free — exactly what
  * `array_sort` over [[Shingles]] (distinct by construction) yields.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.intersectCountSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetKernels.intersectCountSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SetExpressions {
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
