package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store provider selection (r8 verdict task #8).
  *
  * The default HDFS-backed provider keeps every operator's state ON HEAP —
  * fine for the model-sized specs, but at 100 TB/day the
  * [[NearDupStream]] per-bucket registry and the watermark horizons of
  * the interval joins grow past what a JVM heap should hold: state
  * belongs in RocksDB (off-heap, spillable to local disk, incremental
  * checkpointing), which ships in Spark's own jars. The provider is a
  * session-level option, not a code change — every transform in
  * [[EventsStream]]/[[NearDupStream]] runs unmodified on either store
  * (identical results asserted in StateStoreSpec), which is exactly the
  * property that makes the switch deployable: flip the conf, replay the
  * checkpoint, nothing else moves.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Spark's bundled RocksDB provider (rocksdbjni ships in the Spark
    * distribution — no extra dependency).
    */
  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with this session's streaming state store switched to
    * RocksDB, restoring the previous provider on the way out. The conf is
    * read at QUERY START, so queries started inside `body` use RocksDB
    * for their lifetime; already-running queries are untouched (a
    * restarted query resumes from its checkpoint on the new provider —
    * state files are provider-specific, so production flips the conf
    * between runs, not mid-run).
    */
  def withRocksDB[A](spark: SparkSession)(body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDBProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
