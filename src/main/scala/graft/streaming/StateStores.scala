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

  /** Per-session scope bookkeeping: the provider conf is SESSION-WIDE, so
    * two concurrent `withRocksDb` scopes on one session (the 8-way
    * oracle-gate harness runs s18 and s21 in parallel) must not have the
    * first scope's restore flip the provider back to HDFS while the
    * second scope's query is still STARTING — that start would then read
    * the wrong provider and transformWithState refuses it (the round-6
    * s21 concurrency failure). Reference-count the scopes: the first one
    * in captures + sets, only the last one out restores.
    */
  private final class Scope {
    var depth = 0
    var prevProvider: Option[String] = None
    var prevChangelog: Option[String] = None
  }
  private val scopes = new java.util.IdentityHashMap[SparkSession, Scope]

  /** Run `body` (which must START AND DRAIN its streaming queries — the
    * conf is captured at start) with RocksDB state storage, restoring the
    * previous provider once the LAST concurrent scope on this session
    * exits. Safe to nest and to run concurrently on one session.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    scopes.synchronized {
      val sc = Option(scopes.get(spark)).getOrElse {
        val s = new Scope; scopes.put(spark, s); s
      }
      if (sc.depth == 0) {
        sc.prevProvider = spark.conf.getOption(ProviderKey)
        sc.prevChangelog = spark.conf.getOption(ChangelogKey)
        spark.conf.set(ProviderKey, RocksDbProvider)
        spark.conf.set(ChangelogKey, "true")
      }
      sc.depth += 1
    }
    try body
    finally scopes.synchronized {
      val sc = scopes.get(spark)
      sc.depth -= 1
      if (sc.depth == 0) {
        sc.prevProvider.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
        sc.prevChangelog.fold(spark.conf.unset(ChangelogKey))(spark.conf.set(ChangelogKey, _))
        scopes.remove(spark)
      }
    }
  }
}
