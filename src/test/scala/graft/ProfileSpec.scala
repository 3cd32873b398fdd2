package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Column profiler: exact vs approximate agreement and error bounds. */
class ProfileSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")

  test("exact and approx profilers agree on everything but distinct counts") {
    val exact = Profile.summarize(Tables.table(spark, sf, "orders"), cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.summarizeApprox(Tables.table(spark, sf, "orders"), cols)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (name, e) =>
      val a = approx(name)
      assert(e.getAs[Long]("n_rows") == a.getAs[Long]("n_rows"), s"$name n_rows")
      assert(e.getAs[Long]("n_nulls") == a.getAs[Long]("n_nulls"), s"$name n_nulls")
      assert(e.getAs[String]("min_s") == a.getAs[String]("min_s"), s"$name min_s")
      assert(e.getAs[String]("max_s") == a.getAs[String]("max_s"), s"$name max_s")
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct_approx").toDouble
      // HLL++ at rsd=0.05: allow 3x the nominal relative standard deviation
      assert(math.abs(ad - ed) / ed <= 0.15,
        s"$name distinct: exact=$ed approx=$ad")
    }
  }
}
