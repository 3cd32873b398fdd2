package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the declarative twin of the
  * streaming [[graft.streaming.StreamOps.sessionize]] (same session
  * semantics, verified equal in StreamOpsSpec): a session closes when no
  * event arrives within `gap` of its last event.
  *
  * 100 TB design notes:
  *  - One shuffle total: the window partitions by user and sorts by
  *    (ts, id); the session-id is a running sum of gap-break flags over
  *    that SAME window frame, so Catalyst evaluates lag + cumulative sum
  *    in a single WindowExec pass, and the final groupBy reuses the
  *    user-hash partitioning (no second exchange of raw events).
  *  - Per-user state is a sort run, not materialized memory — power
  *    users with millions of events spill to disk in the sort, they do
  *    not OOM an executor (the streaming variant bounds the same state
  *    by watermark instead).
  *  - Sums go through DECIMAL: session aggregates are shuffle-order
  *    independent and oracle-exact.
  */
object Sessionize {

  /** (user, session_start, session_end, n_events, sum_value) per
    * session. `tsCol` is any monotic numeric timeline (the caller picks
    * the unit; `gap` is in the same unit). `idCol` breaks timestamp
    * ties deterministically.
    */
  def sessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      gap: Long): DataFrame = {
    val byTime = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val newSession = when(
      col("__prev").isNull || col(tsCol) - col("__prev") > gap, 1L).otherwise(0L)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("__sid", sum(newSession).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .drop("__sid")
  }
}
