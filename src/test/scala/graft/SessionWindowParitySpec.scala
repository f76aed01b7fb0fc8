package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Relational
import graft.streaming.{EventStreams, UserEvent}

/** VERDICT r7 stretch #6: three sessionizer implementations behind one
  * seam — the lag/cumsum batch twin (`sessionizeBatch`, q57), Spark's
  * built-in `session_window` (`sessionizeSessionWindow`), and the
  * streaming `flatMapGroupsWithState` sessionizer — cross-checked,
  * including the exact gap boundary (1800 s merges, 1801 s splits).
  *
  * Precision note pinned here on purpose: the batch twin and the
  * built-in compare SECOND-TRUNCATED gaps (bit-identical on any input
  * — the first test runs real sub-second timestamps), while the
  * streaming sessionizer splits on raw milliseconds. The three-way
  * test therefore uses whole-second fixtures, where all three
  * semantics coincide. The boundary test also PINS the built-in's
  * merge rule (sessions whose windows TOUCH merge — diff ≤ gap, not
  * diff < gap): `sessionizeSessionWindow` passes the gap through
  * unchanged because of it, and a Spark-side change to that rule
  * would fail here before it could silently shift session splits. */
class SessionWindowParitySpec extends SparkSuite {

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.select(col("user_id"), col("session_id"), col("session_start"),
      col("session_end"), col("n_events"), col("n_types"), col("duration_s"))
      .collect().map(_.toSeq).toSet

  test("built-in session_window reproduces the batch sessionizer on real sub-second events (sf0.001)") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val a = Relational.sessionizeBatch(ev)
    val b = Relational.sessionizeSessionWindow(ev)
    val ca = canon(a)
    assert(ca.nonEmpty, "no sessions produced")
    assert(ca == canon(b), "batch vs session_window sessions diverge")
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  // user 1: 10:00:00 → +1800 s (merges) → +1801 s after that (splits)
  private val fixture = Seq(
    (1L, 10L, "2024-05-01 10:00:00", "view"),
    (2L, 10L, "2024-05-01 10:30:00", "click"),   // gap 1800 s: same session
    (3L, 10L, "2024-05-01 11:00:01", "purchase") // gap 1801 s: new session
  )

  test("batch and session_window agree on the exact gap boundary") {
    val sp = spark
    import sp.implicits._
    val ev = fixture.toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("tss")).as("ts"), col("event_type"))
    val a = canon(Relational.sessionizeBatch(ev))
    assert(a == canon(Relational.sessionizeSessionWindow(ev)))
    assert(a.size == 2, s"expected the 1800 s gap to merge and 1801 s to split: $a")
    val s1 = a.find(_(1) == 1L).get
    assert(s1(4) == 2L && s1(6) == 1800L, s"session 1 wrong: $s1")
    val s2 = a.find(_(1) == 2L).get
    assert(s2(4) == 1L && s2(6) == 0L, s"session 2 wrong: $s2")
  }

  test("the streaming sessionizer closes the same two sessions (three-way agreement)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventStreams.sessionize(mem.toDS(),
      gapMs = Relational.SESSION_GAP_SECONDS * 1000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("threeway_sessions")
      .outputMode("append").start()
    try {
      mem.addData(fixture.map { case (_, u, t, e) => UserEvent(u, ts(t), e) }: _*)
      q.processAllAvailable()
      // a far-future other-user event pushes the watermark so the
      // trailing open session times out and emits
      mem.addData(UserEvent(99L, ts("2024-05-02 00:00:00"), "view"))
      q.processAllAvailable()
      val rows = sp.sql(
        """SELECT start_ts, end_ts, n_events FROM threeway_sessions
          |WHERE user_id = 10 ORDER BY start_ts""".stripMargin).collect()
      assert(rows.length == 2, s"streaming session count: ${rows.length}")
      assert(rows(0).getTimestamp(0) == ts("2024-05-01 10:00:00") &&
        rows(0).getTimestamp(1) == ts("2024-05-01 10:30:00") &&
        rows(0).getLong(2) == 2L, s"streaming session 1: ${rows(0)}")
      assert(rows(1).getTimestamp(0) == ts("2024-05-01 11:00:01") &&
        rows(1).getLong(2) == 1L, s"streaming session 2: ${rows(1)}")
    } finally q.stop()
  }
}
