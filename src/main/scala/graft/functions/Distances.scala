package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Categorical dissimilarity kernels (SURVEY.md §3.1 R4-R6).
  *
  * Reference semantics [UP pyspark_kmodes/pyspark_kmodes.py hamming_dissim
  * ~L85-105 | conf=H]: simple-matching (Hamming) distance between one record
  * and each of k modes; nearest-mode assignment is the argmin over those k
  * distances.
  *
  * Spark-first design: everything here is a pure Catalyst `Column`
  * expression built from higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — no UDF, no serialization boundary, evaluated natively
  * inside the generated plan. Centers travel as a literal array (they are
  * tiny: k ≤ 64 rows), i.e. the "broadcast small side" of SURVEY.md §3.2 is
  * a constant folded into the expression — zero shuffle for assignment.
  */
object Distances {

  /** Hamming (simple-matching) distance between two string arrays.
    * Null-safe: positions compare with <=> so a null sentinel that survived
    * assembly still counts as its own category.
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x <=> y, 0).otherwise(1)),
      lit(0),
      (acc, x) => acc + x)

  /** Distances from `features` to each center in a literal center list:
    * returns `array<int>` of length k.
    */
  def hammingToCenters(features: Column, centers: Column): Column =
    transform(centers, c => hamming(features, c))

  /** argmin over a distance array → cluster index (0-based). Deterministic:
    * `array_position` returns the FIRST position of the min, so ties go to
    * the lowest cluster id (the reference inherits numpy argmin's same
    * first-wins rule [UP ...py ~L130-145 | conf=H]).
    */
  def argminIndex(dists: Column): Column =
    (array_position(dists, array_min(dists)) - 1).cast("int")

  /** Assignment + min-distance in one pass, as a struct column.
    * Delegates to the codegen'd [[HammingAssign]] expression — the
    * composed form (kept above for reference/SQL parity) evaluates the
    * interpreted distance array twice per row and is ~5× slower on the
    * Lloyd inner loop.
    */
  def assign(features: Column, centers: Column): Column =
    HammingFunctions.assign(features, centers)

  /** The pre-native composed form (pure built-ins); semantically
    * identical to [[assign]] — used by tests as a cross-check.
    */
  def assignComposed(features: Column, centers: Column): Column = {
    val d = hammingToCenters(features, centers)
    struct(argminIndex(d).as("prediction"), array_min(d).as("min_dist"))
  }
}
