package graft

import org.apache.spark.sql.functions._

/** Hive-style partitioned data layout (the companion of BucketingSpec's
  * co-located joins): writes partitioned by a low-cardinality column
  * prune entire directories at read time — at 100 TB, a `lang = 'en'`
  * filter over a lang-partitioned corpus reads only that partition's
  * files, no row-level filtering needed.
  */
class PartitionedWriteSpec extends SparkSuite {

  test("partitioned write prunes non-matching partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    // directory layout is hive-style
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(subdirs.nonEmpty, "expected lang=<value> partition directories")

    val en = spark.read.parquet(dir).where(col("lang") === "en")
    val p = en.queryExecution.executedPlan.toString
    // the filter must appear as a PARTITION filter (directory pruning),
    // not (only) a data filter evaluated per row
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not applied at partition level:\n$p")
    assert(p.contains("= en)"), s"lang=en equality not in partition filters:\n$p")

    // pruned read returns exactly the partition's rows
    val expected = docs.where(col("lang") === "en").count()
    assert(en.count() == expected)
    assert(expected > 0)
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan") {
    // the 100 TB join shape: fact partitioned by a key, dim filtered at
    // runtime — DPP must push the dim's surviving keys into the fact
    // scan's PARTITION filters (a static plan would read every
    // partition and filter rows post-scan)
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = docs.select(col("lang").as("d_lang"),
        col("n_chars").as("d_n")).distinct()
      .where(col("d_n") > 100) // runtime-selective predicate
    val joined = fact.join(broadcast(dim), col("lang") === col("d_lang"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in the fact " +
        s"scan's partition filters:\n$p")
    // and the join answer matches the un-partitioned equivalent
    val want = docs.join(broadcast(dim), col("lang") === col("d_lang"))
      .count()
    assert(joined.count() == want && want > 0)
  }
}
