package graft

import graft.operators.SetSimJoin

/** Prefix-filter set-similarity join vs brute-force Jaccard — the
  * blocking must be COMPLETE (the theorem, exercised on randomized
  * corpora) and the verify exact.
  */
class SetSimJoinSpec extends SparkSuite {
  import spark.implicits._

  private def jacPpm(a: Set[String], b: Set[String]): (Long, Long) = {
    val i = (a & b).size.toLong
    val u = (a | b).size.toLong
    (i, u)
  }

  private def brute(docs: Map[Long, Set[String]], tPpm: Long) =
    (for {
      a <- docs.keys; b <- docs.keys if a < b
      (i, u) = jacPpm(docs(a), docs(b))
      if u > 0 && i * 1000000L >= u * tPpm
    } yield (a, b) -> (i, u, i * 1000000L / u)).toMap

  test("tokenJaccardSelfPairs equals brute force on a randomized corpus") {
    // seeded corpus of overlapping token sets: base vocab + per-doc
    // noise, plus exact dups, a subset pair, and an empty doc
    val rng = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    val docs: Map[Long, Set[String]] =
      (1L to 40L).map { id =>
        val n = 3 + rng.nextInt(8)
        id -> (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).toSet
      }.toMap + (100L -> Set("a", "b", "c")) + (101L -> Set("a", "b", "c")) +
        (102L -> Set("a", "b", "c", "d")) + (103L -> Set.empty[String])
    val df = docs.toSeq.map { case (id, s) => (id, s.mkString(" ")) }
      .toDF("id", "text")
    for (tPpm <- Seq(500000L, 700000L, 900000L)) {
      val got = SetSimJoin.tokenJaccardSelfPairs(df, "id", "text", tPpm)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      assert(got == brute(docs, tPpm), s"t=$tPpm")
    }
    // the dup pair and the 3-of-4 subset pair are found at 0.7
    val at07 = SetSimJoin.tokenJaccardSelfPairs(df, "id", "text", 700000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(at07.contains((100L, 101L)) && at07.contains((100L, 102L)))
  }

  test("empty and token-free docs drop; hub prefix bucket raises") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(SetSimJoin.tokenJaccardSelfPairs(empty, "id", "text", 500000L)
      .count() == 0L)
    val blank = Seq((1L, "   "), (2L, ""), (3L, "x")).toDF("id", "text")
    assert(SetSimJoin.tokenJaccardSelfPairs(blank, "id", "text", 500000L)
      .count() == 0L)
    // 6 single-token docs of the same word: the token is every doc's
    // whole prefix -> one bucket of 6 > cap of 5
    val hub = (1 to 6).map(i => (i.toLong, "same")).toDF("id", "text")
    val e = intercept[Exception] {
      SetSimJoin.tokenJaccardSelfPairs(hub, "id", "text", 500000L,
        maxPrefixBucket = 5).collect()
    }
    assert(e.getMessage.contains("maxPrefixBucket"), e.getMessage)
  }
}
