package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration invariants for the driver contract: a typo'd oracle key
  * would silently downgrade a query to the weaker rows-only check.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles with no query: $orphans")
  }

  test("exactly the documented queries are rows-only") {
    val rowsOnly = Queries.all.keySet -- Queries.oracles.keySet
    assert(rowsOnly == Set("q15_kmodes_ensemble"),
      s"rows-only set drifted (ensemble fit is the only blessed one): $rowsOnly")
  }

  test("query names follow the qN+_ scheme with no duplicates or gaps") {
    assert(Queries.all.keySet.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    val nums = Queries.all.keySet.map(_.takeWhile(_ != '_'))
    assert(nums.size == Queries.all.size, "duplicate qN prefix")
    val ints = nums.map(_.drop(1).toInt).toSeq.sorted
    assert(ints == (1 to Queries.all.size), s"gap in query numbering: $ints")
  }
}
