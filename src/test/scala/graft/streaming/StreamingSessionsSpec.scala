package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

case class SEv(user_id: Long, ts: Timestamp)

/** Session windows must close and emit in append mode once the watermark
  * passes, and the streaming result must equal the batch session_window
  * result on the same data.
  */
class StreamingSessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def t(min: Long) = new Timestamp(min * 60000L)

  test("streaming session windows equal batch; close on watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // user 1: events at 0min and 10min (one session with 30min gap), then
    // 120min (second session). user 2: one event at 5min.
    val evs = Seq(SEv(1, t(0)), SEv(1, t(10)), SEv(2, t(5)), SEv(1, t(120)))
    // far-future event advances the watermark past every session's end
    val flush = SEv(99, t(100000))

    val mem = MemoryStream[SEv]
    val out = StreamingSessions.sessionStats(mem.toDF(), "user_id", "ts",
      gap = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(flush)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
      .filter(_._1 != 99L).toSet
    val batch = StreamingSessions.sessionStats(evs.toDF(), "user_id", "ts",
      gap = "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, t(0), 2L), (1L, t(120), 1L), (2L, t(5), 1L)))
  }

  test("tumbling event-time windows count per key") {
    val s = spark
    import s.implicits._
    val evs = Seq(SEv(1, t(0)), SEv(1, t(30)), SEv(1, t(70)), SEv(2, t(5)))
    val out = StreamingSessions.tumblingCounts(evs.toDF(), "user_id", "ts",
      width = "1 hour")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    assert(out == Set((1L, t(0), 2L), (1L, t(60), 1L), (2L, t(0), 1L)))
  }
}
