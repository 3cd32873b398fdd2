package graft

import graft.operators.Basket

/** Market-basket pair rules vs hand-computed support/confidence/lift. */
class BasketSpec extends SparkSuite {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} — (a,b) twice, (a,c) twice,
  // (b,c) once; duplicates within a basket collapse first
  private def fixture =
    Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("b", "i")

  test("pairRules: counts and floor-ppm metrics match hand computation") {
    val got = Basket.pairRules(fixture, "b", "i", minSupport = 2)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // n=4 baskets; counts: a=3, b=3, c=2
    // (a,b): pair 2, support 2e6/4=500000, conf_ab 2e6/3=666666,
    //        conf_ba 666666, lift (2e6 div 3)*4 div 3 = 888888
    assert(got(("a", "b")) ==
      ("a", "b", 2L, 3L, 3L, 500000L, 666666L, 666666L, 888888L))
    // (a,c): pair 2, conf_ab 666666, conf_ba 2e6/2=1000000,
    //        lift (666666*4) div 2 = 1333332
    assert(got(("a", "c")) ==
      ("a", "c", 2L, 3L, 2L, 500000L, 666666L, 1000000L, 1333332L))
    assert(!got.contains(("b", "c"))) // pair_count 1 < minSupport
  }

  test("pairRules: ordering is item_a < item_b after in-basket dedup") {
    val got = Basket.pairRules(fixture, "b", "i", minSupport = 1)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.length == 3)
    assert(got.forall(r => r._1 < r._2))
  }

  test("pairRules: a hub basket over maxBasketSize raises pointedly") {
    val hub = (1 to 12).map(i => (1L, s"i$i")).toDF("b", "i")
    val e = intercept[Exception] {
      Basket.pairRules(hub, "b", "i", minSupport = 1, maxBasketSize = 10)
        .collect()
    }
    assert(e.getMessage.contains("quadratic"),
      s"expected the fan-out guard, got: ${e.getMessage}")
    // at exactly the cap it still computes: 10 items -> 45 pairs
    assert(Basket.pairRules(hub.where($"i" =!= "i11" && $"i" =!= "i12"),
      "b", "i", minSupport = 1, maxBasketSize = 10).count() == 45)
  }

  test("itemSimilarityTopK: hand-computed binary cosine, symmetric, ranked") {
    // baskets: {1,2} {1,2} {1,3} -> n1=3, n2=2, n3=1; n12=2, n13=1
    val df = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L),
      (12L, 3L)).toDF("b", "i")
    val got = Basket.itemSimilarityTopK(df, "b", "i", minSupport = 1, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    def c(nxy: Long, nx: Long, ny: Long) =
      math.floor(nxy.toDouble / math.sqrt((nx * ny).toDouble) * 1e6).toLong
    assert(got == Set(
      (1L, 1L, 2L, c(2, 3, 2)), (1L, 2L, 3L, c(1, 3, 1)),
      (2L, 1L, 1L, c(2, 3, 2)),
      (3L, 1L, 1L, c(1, 3, 1))), s"$got")
    // minSupport prunes the 1-3 pair entirely, BOTH directions
    val pruned = Basket.itemSimilarityTopK(df, "b", "i", minSupport = 2, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pruned == Set((1L, 1L, 2L, c(2, 3, 2)), (2L, 1L, 1L, c(2, 3, 2))),
      s"$pruned")
  }
}
