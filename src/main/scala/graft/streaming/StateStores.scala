package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store deployment configuration for the streaming surface.
  *
  * The default HDFS-backed provider keeps every state row on the executor
  * HEAP — fine for the oracle gate's bounded fixtures, fatal for a
  * continuous 100-TB dedup/defrag (s03/s07 run forever in production and
  * accumulate state monotonically). The production configuration is
  * Spark's RocksDB provider: state lives off-heap in a local RocksDB
  * instance (block cache + SST files on executor disk), with changelog
  * checkpointing so each commit uploads only the batch's delta instead of
  * a full snapshot.
  *
  * The provider is a session-level conf read at STREAM START, so the
  * helper scopes it around query launch and restores the previous value —
  * semantics are provider-independent (StreamingSinkSpec proves batch
  * equality under both providers; the 10⁶-key soak proves the state
  * actually lands in RocksDB).
  */
object StateStores {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Run `body` (which must START AND DRAIN its streaming queries — the
    * conf is captured at start) with RocksDB state storage, restoring the
    * previous provider afterwards.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prevProvider = spark.conf.getOption(ProviderKey)
    val prevChangelog = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ProviderKey, RocksDbProvider)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally {
      prevProvider.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
      prevChangelog.fold(spark.conf.unset(ChangelogKey))(spark.conf.set(ChangelogKey, _))
    }
  }
}
