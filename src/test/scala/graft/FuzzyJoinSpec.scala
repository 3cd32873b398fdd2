package graft

import graft.operators.FuzzyJoin

/** Deletion-neighborhood fuzzy join vs brute-force edit distance. */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("selfPairs: exactly the brute-force distance<=1 pairs, all kinds") {
    // substitution (cat/cut), deletion (cat/at), insertion (cat/cart),
    // exact dup (dog/dog), far pair (dog/walrus), empty + 1-char
    val rows = Seq((1L, "cat"), (2L, "cut"), (3L, "at"), (4L, "cart"),
      (5L, "dog"), (6L, "dog"), (7L, "walrus"), (8L, ""), (9L, "a"))
      .toDF("id", "s")
    val got = FuzzyJoin.selfPairs(rows, "id", "s")
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    val strings = Map(1L -> "cat", 2L -> "cut", 3L -> "at", 4L -> "cart",
      5L -> "dog", 6L -> "dog", 7L -> "walrus", 8L -> "", 9L -> "a")
    val want = (for {
      a <- strings.keys; b <- strings.keys if a < b
      d = lev(strings(a), strings(b)) if d <= 1
    } yield (a, b) -> d.toLong).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got((5L, 6L)) == 0L && got((8L, 9L)) == 1L)
  }

  test("selfPairs guards: over-long strings and hub variants raise") {
    val long = Seq((1L, "x" * 100)).toDF("id", "s")
    val e1 = intercept[Exception] {
      FuzzyJoin.selfPairs(long, "id", "s", maxLen = 64).collect()
    }
    assert(e1.getMessage.contains("maxLen"), e1.getMessage)
    // 12 ids of the same string share the identity variant bucket
    val hub = (1 to 12).map(i => (i.toLong, "same")).toDF("id", "s")
    val e2 = intercept[Exception] {
      FuzzyJoin.selfPairs(hub, "id", "s", maxBucketSize = 10).collect()
    }
    assert(e2.getMessage.contains("quadratic"), e2.getMessage)
  }

  test("selfPairs maxDist=2 matches brute force (transpositions cost 2)") {
    val strings = Map(1L -> "kitten", 2L -> "sitten", 3L -> "sittin",
      4L -> "kitchen", 5L -> "mitten", 6L -> "kiten", 7L -> "nettik",
      8L -> "ab", 9L -> "ba", 10L -> "")
    val rows = strings.toSeq.map { case (k, v) => (k, v) }.toDF("id", "s")
    val got = FuzzyJoin.selfPairs(rows, "id", "s", maxDist = 2)
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    val want = (for {
      a <- strings.keys; b <- strings.keys if a < b
      d = lev(strings(a), strings(b)) if d <= 2
    } yield (a, b) -> d.toLong).toMap
    assert(got == want, s"missing=${want.keySet -- got.keySet} " +
      s"extra=${got.keySet -- want.keySet}")
    // ab<->ba is a transposition: plain levenshtein distance 2, found
    assert(got((8L, 9L)) == 2L)
  }

  test("goldenRecords: transitive clusters, score election, id tie-break") {
    // cat~cut~cot chain (distance-2 ends in ONE entity via transitivity);
    // dog/dig pair; walrus singleton. Scores pick the golden; equal
    // scores fall to the lower id.
    val recs = Seq(
      (1L, "cat", 50L), (2L, "cut", 90L), (3L, "cot", 90L),
      (10L, "dog", 5L), (11L, "dig", 5L), (20L, "walrus", 1L))
      .toDF("id", "name", "score")
    val got = FuzzyJoin.goldenRecords(recs, "id", "name", "score")
      .orderBy("group_id")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "cut", 90L),   // chain entity: score 90 tie -> id 2
      (10L, 2L, 10L, "dog", 5L),  // tie -> lower id
      (20L, 1L, 20L, "walrus", 1L)))
  }

  test("goldenRecords: null keys/ids excluded; negative scores ordered") {
    val recs = Seq(
      (Some(1L), Some("aa"), -10L), (Some(2L), Some("ab"), -5L),
      (Some(3L), None, 99L), (None, Some("zz"), 99L))
      .toDF("id", "name", "score")
    val got = FuzzyJoin.goldenRecords(recs, "id", "name", "score")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, "ab", -5L)))
  }
}
