package graft

import graft.operators.{Encoding, Rollup}
import org.apache.spark.sql.functions._

/** Top-n+(others) derivation and label-dictionary determinism. */
class RollupEncodingSpec extends SparkSuite {
  import spark.implicits._

  test("topNOthers: head by (value desc, key asc); others derived exactly") {
    val df = Seq((1L, 10L), (1L, 5L), (2L, 20L), (3L, 20L), (4L, 1L),
      (5L, 2L)).toDF("k", "v")
    val got = Rollup.topNOthers(df, "k", "v", n = 2)
      .orderBy("rank").as[(Long, String, Long, Long)].collect().toSeq
    // sums: k1=15, k2=20, k3=20, k4=1, k5=2; tie 20 -> key 2 first
    assert(got == Seq((1L, "2", 20L, 1L), (2L, "3", 20L, 1L),
      (3L, "(others)", 18L, 3L)))
    // report total == table total by construction
    assert(got.map(_._3).sum == 58L)
  }

  test("topNOthers: n covers all keys -> zeroed others; empty input") {
    val df = Seq((1L, 3L), (2L, 4L)).toDF("k", "v")
    val got = Rollup.topNOthers(df, "k", "v", n = 5)
      .orderBy("rank").as[(Long, String, Long, Long)].collect().toSeq
    assert(got.last == (6L, "(others)", 0L, 0L))
    val empty = Rollup.topNOthers(df.limit(0), "k", "v", n = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(empty == Seq((4L, "(others)", 0L, 0L)))
  }

  test("labelDictionary: dense frequency-ranked codes, null excluded") {
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("c"), Some("c"),
      None).toDF("x")
    val got = Encoding.labelDictionary(df, "x")
      .orderBy("code").as[(String, Long, Long)].collect().toSeq
    // counts: b=2, c=2, a=1; tie 2 -> value asc: b before c
    assert(got == Seq(("b", 0L, 2L), ("c", 1L, 2L), ("a", 2L, 1L)))
  }

  test("encode: codes replace values; unseen encodes null") {
    val train = Seq("b", "b", "a").toDF("x")
    val dict = Encoding.labelDictionary(train, "x")
    val applied = Encoding.encode(
        Seq((1L, "a"), (2L, "b"), (3L, "zz")).toDF("id", "x"), "x", dict)
      .orderBy("id").select("id", "x").collect()
    assert(applied(0).getLong(1) == 1L) // a -> code 1 (b more frequent)
    assert(applied(1).getLong(1) == 0L)
    assert(applied(2).isNullAt(1), "unseen category must encode NULL")
  }

  test("targetEncodeLoo: held-out means, singleton null, null-target full mean") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(2.0)),
      (3L, Some("a"), Some(4.0)), (4L, Some("a"), None),
      (5L, Some("b"), Some(5.0)),
      (6L, None, Some(7.0)), (7L, None, Some(9.0)))
      .toDF("id", "k", "y")
    val got = Encoding.targetEncodeLoo(df, "k", "y")
      .orderBy("id")
      .select("id", "n_key", "loo_e6")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq(
      (1L, 3L, Some(3000000L)),  // (2+4)/2
      (2L, 3L, Some(2500000L)),  // (1+4)/2
      (3L, 3L, Some(1500000L)),  // (1+2)/2
      (4L, 3L, Some(2333333L)),  // null target -> full mean 7/3 floored
      (5L, 1L, None),            // singleton: nothing to borrow
      (6L, 2L, Some(9000000L)),  // null key is a group
      (7L, 2L, Some(7000000L))))
  }

  test("targetEncodeLoo: negative and out-of-domain targets raise") {
    val neg = Seq(("a", -1.0)).toDF("k", "y")
    val e1 = intercept[Exception] {
      Encoding.targetEncodeLoo(neg, "k", "y").collect()
    }
    assert(e1.getMessage.contains("negative"), e1.getMessage)
    val huge = Seq(("a", 2.0e10)).toDF("k", "y")
    val e2 = intercept[Exception] {
      Encoding.targetEncodeLoo(huge, "k", "y").collect()
    }
    assert(e2.getMessage.contains("overflows"), e2.getMessage)
  }

  test("prorate: floors + remainder keep the parent-total invariant") {
    import graft.operators.Rollup
    // total 100 over equal weights [1,1,1]: 33/33/33 + 1 cent to first
    val df = Seq(("a", 1L, 1L, 100L), ("a", 2L, 1L, 100L),
      ("a", 3L, 1L, 100L), ("b", 1L, 0L, 50L), ("b", 2L, 0L, 50L))
      .toDF("p", "ord", "w", "total")
    val got = Rollup.prorate(df, "p", "ord", "w", "total")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(got == Map(("a", 1L) -> 34L, ("a", 2L) -> 33L,
      ("a", 3L) -> 33L,
      // zero total weight: everything to the first child, nothing lost
      ("b", 1L) -> 50L, ("b", 2L) -> 0L), got.toString)
    // invariant under any weights: sums match the parent total
    val skew = Seq(("c", 1L, 7L, 999L), ("c", 2L, 3L, 999L),
      ("c", 3L, 11L, 999L)).toDF("p", "ord", "w", "total")
    val sums = Rollup.prorate(skew, "p", "ord", "w", "total")
      .groupBy("p").sum("alloc").as[(String, Long)].collect().toMap
    assert(sums("c") == 999L, sums.toString)
    // negative weight raises
    val e = intercept[Exception] {
      Rollup.prorate(Seq(("d", 1L, -1L, 10L)).toDF("p", "ord", "w", "total"),
        "p", "ord", "w", "total").collect()
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }

  test("hierarchyRollup: closed-form ancestors, exact subtree sums") {
    import graft.operators.Rollup
    // fanout 2 over ids 1..7 (heap tree), value = id:
    // node 1 = all (28/7), node 2 = {2,4,5} (11/3), node 3 = {3,6,7}
    val df = (1L to 7L).map(i => (i, i)).toDF("id", "v")
    val got = Rollup.hierarchyRollup(df, "id", "v", fanout = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((7L, 28L)), got.toString)
    assert(got(2L) == ((3L, 11L)), got.toString)
    assert(got(3L) == ((3L, 16L)), got.toString)
    assert(got(7L) == ((1L, 7L)), got.toString)
    assert(got.size == 7, got.toString)
    // divisor exactness past 2^53: fanout 13 at depth 15 is where
    // math.pow's double image first goes inexact (13^15 = 51185893014090757
    // but pow gives ...756) — a leaf at that id must land on ancestor 1,
    // not on a phantom neighbor node
    val big = 51185893014090757L // 13^15 exactly
    val deep = Seq((big, 1L)).toDF("id", "v")
    val anc = Rollup.hierarchyRollup(deep, "id", "v", fanout = 13,
        maxDepth = 16)
      .as[(Long, Long, Long)].collect().map(_._1).sorted
    // ancestors are big/13^0 .. big/13^15 = exact powers down to 1
    val want = (0 to 15).map(i => big / (0 until i)
      .foldLeft(1L)((d, _) => d * 13)).distinct.sorted
    assert(anc.toSeq == want, s"got ${anc.toSeq} want $want")
    assert(anc.head == 1L, anc.toSeq.toString)
  }

  test("hashFeatures: buckets/signs replay the portable hash exactly") {
    import org.apache.spark.sql.functions.{col, split}
    // driver-side twin of PortableHash.hash60 (first 60 md5 bits)
    def hash60(salt: String, key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + 1.toChar + key).getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def expected(tokens: Seq[String]): Map[Long, Long] =
      tokens.groupBy { t =>
        hash60("feat", t) % 32
      }.map { case (b, ts) =>
        b -> ts.map(t =>
          if ((hash60("feat", t) / 32) % 2 == 0) 1L else -1L).sum
      }.filter(_._2 != 0L)
    val df = Seq((1L, "alpha alpha beta"), (2L, "gamma")).toDF("id", "txt")
    val got = Encoding.hashFeatures(df, "id", split(col("txt"), " "), 32)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => r._2 -> r._3).toMap }
    assert(got(1L) == expected(Seq("alpha", "alpha", "beta")),
      got(1L).toString)
    assert(got(2L) == expected(Seq("gamma")), got(2L).toString)
    // a repeated token doubles its signed weight (same bucket by
    // construction), and bucket ids stay inside [0, nBuckets)
    assert(got(1L).values.exists(w => w == 2L || w == -2L))
    assert(got.values.flatMap(_.keys).forall(b => b >= 0 && b < 32))
  }
}
