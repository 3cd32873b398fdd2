package graft

import java.sql.Timestamp
import graft.operators.Sessionize
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch gap sessionization: semantics, determinism, and equality with
  * the streaming sessionizer on identical input (the two are documented
  * twins).
  */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Base = 100
  private def ts(min: Int): Timestamp = new Timestamp((Base + min) * 60000L)
  private val Gap = 5 * 60000L

  // user 1: two sessions; user 2: two singletons; user 99: flush driver.
  // Listed in event-time order: the parity test feeds these to the
  // streaming sessionizer in 3 batches, and an early event arriving
  // after the watermark passed it would be dropped as late (correct
  // streaming semantics, but not what this test is about).
  private val events = Seq(
    Event(1, ts(0), 1, "click", 1.0), Event(5, ts(1), 2, "click", 8.0),
    Event(2, ts(2), 1, "click", 2.0),
    Event(3, ts(20), 1, "view", 3.0), Event(4, ts(23), 1, "view", 4.0),
    Event(6, ts(40), 2, "view", 16.0),
    Event(9, ts(600), 99, "click", 0.5))

  private def batchSessions: Set[(Long, Long, Long, Int, Double)] =
    Sessionize.sessions(
        events.toDF().withColumn("tsl", unix_millis(col("ts"))),
        "user_id", "tsl", "event_id", "value", Gap)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Int, Double)].collect().toSet

  test("gaps split sessions; aggregates are exact") {
    assert(batchSessions == Set(
      (1L, ts(0).getTime, ts(2).getTime, 2, 3.0),
      (1L, ts(20).getTime, ts(23).getTime, 2, 7.0),
      (2L, ts(1).getTime, ts(1).getTime, 1, 8.0),
      (2L, ts(40).getTime, ts(40).getTime, 1, 16.0),
      (99L, ts(600).getTime, ts(600).getTime, 1, 0.5)))
  }

  test("batch sessions equal streaming sessionize on the same events") {
    val input = MemoryStream[Event]
    val out = StreamOps.sessionize(input.toDS(), gapMs = Gap, "1 minutes")
    val name = s"sess_${System.nanoTime()}"
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      // the far-future user-99 event advances the watermark past every
      // other session's end + gap, timing them all out
      events.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name)
        .select(col("user_id"), unix_millis(col("session_start")),
          unix_millis(col("session_end")), col("n_events"), col("sum_value"))
        .as[(Long, Long, Long, Int, Double)].collect().toSet
    } finally q.stop()
    // user 99's own session never times out (nothing advances the
    // watermark past it) — it is open state, not output
    val closedBatch = batchSessions.filterNot(_._1 == 99L)
    assert(streamed == closedBatch,
      s"stream=$streamed\nbatch=$closedBatch")
  }

  test("timestamp ties stay in one session and order by id deterministically") {
    val df = Seq(
      (10L, 1000L, 5L, 1.0), (11L, 1000L, 5L, 2.0), (12L, 1000L + Gap + 1, 5L, 4.0))
      .toDF("event_id", "tsl", "user_id", "value")
    val out = Sessionize.sessions(df, "user_id", "tsl", "event_id", "value", Gap)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(out == Set(
      (5L, 1000L, 1000L, 2, 3.0),
      (5L, 1000L + Gap + 1, 1000L + Gap + 1, 1, 4.0)))
  }
}
