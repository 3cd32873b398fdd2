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

  /** THRESHOLD-AWARE merge-walk (round-17; the PPJoin positional
    * filter): exact |A∩B| whenever the pair can still satisfy the exact
    * integer Jaccard predicate `inter·1e6 ≥ t_ppm·(|A|+|B|−inter)`,
    * or −1 the moment the positional upper bound
    * `c + min(remaining_a, remaining_b)` proves it cannot. The abort is
    * SOUND (the bound dominates every continuation), so a passing pair
    * always gets its exact count and only provably-failing pairs get
    * the sentinel — which the caller's own `inter·1e6 ≥ t_ppm·uni`
    * filter then rejects (−1e6 is below any non-negative right side).
    * On a near-dup threshold most candidates fail early: the walk ends
    * after ~(1−t)·n mismatches instead of n. ONLY for callers whose
    * keep-predicate is exactly this integer form — a rounded float
    * Jaccard filter can pass pairs the bound would abort.
    */
  def intersectCountBounded(
      a: ArrayData, b: ArrayData, thresholdPpm: Long): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // smallest passing inter: inter·(1e6+t) ≥ t·(na+nb), ceil division
    val need = (thresholdPpm * (na + nb).toLong + 1000000L +
      thresholdPpm - 1L) / (1000000L + thresholdPpm)
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ra = na - i
      val rb = nb - j
      if (c + (if (ra < rb) ra else rb) < need) return -1
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

/** [[SortedIntersectCount]] with the positional threshold abort
  * ([[SetKernels.intersectCountBounded]]) — exact for every pair that
  * can meet `inter·1e6 ≥ thresholdPpm·uni`, −1 for provably-failing
  * pairs. Same caller contract (sorted, distinct) plus: the consumer's
  * keep-predicate must be exactly that integer form.
  */
case class SortedIntersectCountBounded(
    left: Expression, right: Expression, thresholdPpm: Long)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count_bounded"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.intersectCountBounded(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], thresholdPpm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetKernels.intersectCountBounded(" +
        s"$a, $b, ${thresholdPpm}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountBounded =
    copy(left = newLeft, right = newRight)
}

object SetExpressions {
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def sortedIntersectCountBounded(
      a: Column, b: Column, thresholdPpm: Long): Column =
    Bridge.column(SortedIntersectCountBounded(
      Bridge.expression(a), Bridge.expression(b), thresholdPpm))
}
