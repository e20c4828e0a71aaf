package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Stateful processors for Spark 4.x `transformWithState` — the modern
  * arbitrary-state API (successor to mapGroupsWithState): typed state
  * variables with optional TTL, timers, and a RocksDB-backed store.
  * These complement the engine's table-as-state upsert path
  * ([[graft.sinks.UpsertWriter]]) for state that must live in the store
  * rather than the table.
  *
  * Note: `transformWithState` requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`); the bundled rocksdbjni ships
  * with Spark. */
object Processors {

  /** Running event count per key, held in a `ValueState[Long]` — the
    * minimal demonstration of the typed-state lifecycle (init → get →
    * update per micro-batch). Emits (key, runningCount) on every input
    * batch that touches the key. */
  class RunningCount extends StatefulProcessor[Long, (Long, Double), (Long, Long)] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val c = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(c)
      Iterator.single((key, c))
    }
  }
}
