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
}
