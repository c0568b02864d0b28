package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-user running profile accumulated through the Spark 4
  * transformWithState API (state v2 — the typed successor to
  * flatMapGroupsWithState: named state variables on the RocksDB
  * store, explicit TTL, timer hooks). The profile is deliberately
  * order-independent (count + max), so the stream equals the batch
  * twin regardless of micro-batch boundaries — StreamSpec drives it
  * through a multi-batch run (maxFilesPerTrigger=1) and a
  * truncated-commit restart.
  */
case class UserEvent(user_id: Long, value: Double)
case class UserProfile(user_id: Long, n_events: Long, max_value: Double)

class ProfileProcessor extends StatefulProcessor[Long, UserEvent, UserProfile] {
  @transient private var st: ValueState[UserProfile] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserProfile]("profile",
      Encoders.product[UserProfile], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      tv: TimerValues): Iterator[UserProfile] = {
    var cur =
      if (st.exists()) st.get()
      else UserProfile(key, 0L, Double.NegativeInfinity)
    rows.foreach { e =>
      cur = UserProfile(key, cur.n_events + 1,
        math.max(cur.max_value, e.value))
    }
    st.update(cur)
    // Update mode: one refreshed profile row per key per micro-batch
    Iterator.single(cur)
  }
}

object StateV2 {
  /** The streaming side (requires the RocksDB state-store provider —
    * a transformWithState contract, not a choice). The batch twin is
    * Streams.`stream_state_profile`. */
  def profileStream(events: DataFrame): Dataset[UserProfile] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("value").cast("double").as("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
