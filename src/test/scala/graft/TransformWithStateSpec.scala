package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** Running per-user value total (typed keyed state). */
class RunningTotalProcessor extends StatefulProcessor[Long, Ev, (Long, Double)] {
  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Double](
      "total", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[Ev], timerValues: TimerValues): Iterator[(Long, Double)] = {
    var t = if (total.exists()) total.get() else 0.0
    rows.foreach(e => t += e.value)
    total.update(t)
    Iterator((key, t))
  }
}

/** Spark 4's transformWithState (the StatefulProcessor successor to
  * (flat)MapGroupsWithState) — needs the RocksDB state store provider.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("transformWithState keeps typed per-key state across batches") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val out = mem.toDS()
        .groupByKey(_.user_id)
        .transformWithState(
          new RunningTotalProcessor, TimeMode.None(), OutputMode.Append(),
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      val q = out.toDF("user_id", "running_total")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Append).start()
      mem.addData(
        Ev(ts("2024-01-01 10:00:00"), "view", 1.5, 1L),
        Ev(ts("2024-01-01 10:01:00"), "view", 2.5, 1L))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 10:02:00"), "click", 10.0, 1L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_out").orderBy("running_total").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.contains((1L, 4.0)))  // after batch 1
      assert(rows.contains((1L, 14.0))) // state carried into batch 2
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
