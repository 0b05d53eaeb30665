package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.PacketSchema
import graft.dissect.PacketDissector
import graft.pcapio.PcapFramer
import graft.spark.PcapSource

/** DataSource V2 pcap/pcapng reader: `spark.read.format("pcap").load(path)`.
  *
  * Design (SURVEY §7 "optional DSv2 FileFormat"):
  *   - one `InputPartition` per file — pcap has no sync markers, so a file
  *     is the unit of parallelism (§4.3); a 1000-executor cluster reading
  *     a million captures gets a million independent tasks;
  *   - the reader streams blocks through [[graft.pcapio.PcapFramer]] — no
  *     whole-file buffering, unlike `binaryFiles` (2 GiB ceiling);
  *   - column pruning is honored: pruned columns are dropped at row
  *     construction (`SupportsPushDownRequiredColumns`), so narrow
  *     analytics queries don't pay for DNS-name/UTF8 materialization.
  *
  * Options: `mode=reference-compat` reproduces the reference's EPB quirks
  * (SURVEY §2.1); `decodePartitions=N` shards each file's DISSECTION
  * across N partitions (the single-huge-file knob — see
  * [[PcapScan.planInputPartitions]]; batch reads only, the streaming
  * source parallelizes by file).
  */
class PcapDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pcap"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("bytes", false)) PacketSchema.bytesSchema
    else PacketSchema.schema

  /** Writes carry arbitrary projections of the packet table (the sink only
    * requires `frame_bytes`); external metadata lets Spark hand us the
    * incoming DataFrame's schema instead of arity-checking against the
    * fixed 31-column read schema.
    */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PcapTable(schema, properties.asScala.toMap)
}

final class PcapTable(tableSchema: StructType, properties: Map[String, String])
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    "pcap:" + properties.getOrElse("path", properties.getOrElse("paths", "?"))
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PcapScanBuilder(options)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PcapWriteBuilder(
      properties.getOrElse("path",
        throw new IllegalArgumentException("pcap write needs a path")),
      info.schema(),
      info.options())
}

final class PcapScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private val withBytes = options.getBoolean("bytes", false)
  private var required: StructType =
    if (withBytes) PacketSchema.bytesSchema else PacketSchema.schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the filters [[PcapFilters]] can evaluate on the dissected row,
    * but report ALL filters as residual (return value) so Spark still
    * re-evaluates them — the reader-side filter is a row-skipping
    * optimization (no InternalRow materialization for dropped packets,
    * e.g. the fragment-gate `ip_frag_offset = 0`), not a correctness
    * contract.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(PcapFilters.supported)
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = {
    // the multi-path `paths` option arrives as a JSON array (Spark
    // encodes load(paths*) that way) — parse it as one, not by string
    // surgery: a path containing a comma would otherwise shatter into
    // bogus fragments
    val paths = Option(options.get("paths"))
      .map(js => new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq)
      .getOrElse(Option(options.get("path")).toSeq)
    val decodeParts = options.getInt("decodePartitions", 1)
    require(decodeParts >= 1 && decodeParts <= 1024,
      s"pcap option decodePartitions must be in [1, 1024], got $decodeParts")
    new PcapScan(paths, required,
      options.getOrDefault("mode", "sane") == "reference-compat", pushed,
      withBytes,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      decodeParts,
      options.getBoolean("strictLanding", false))
  }
}

final class PcapScan(
    paths: Seq[String],
    required: StructType,
    refCompat: Boolean,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    withBytes: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    decodePartitions: Int = 1,
    strictLanding: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // refuse rather than silently ignore: the streaming source's unit of
    // admission control is the FILE (maxFilesPerTrigger); a stride shard
    // would split one file's rows across offsets and break replay
    require(decodePartitions == 1,
      "pcap streaming read does not support decodePartitions " +
        "(parallelism is per file; use maxFilesPerTrigger)")
    // withBytes/filters ride along: dropping them made every bytes-mode
    // streaming task die on a schema-ordinal lookup. Multi-root paths
    // stream natively since round 9: one watermark per root in a
    // composite offset (see PcapMicroBatchStream).
    new PcapMicroBatchStream(paths, required, refCompat, checkpointLocation,
      maxFilesPerTrigger, filters, withBytes, strictLanding)
  }
  override def description(): String =
    s"PcapScan(${paths.mkString(",")}, cols=${required.fieldNames.mkString(",")}" +
      (if (filters.nonEmpty) s", pushed=${filters.mkString(";")})" else ")")

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val files = PcapFileEnum.list(paths, hconf)
    // decodePartitions > 1 = the SINGLE-HUGE-FILE parallelism knob (the
    // DSv2 twin of PcapSource's RDD-path repartition, round-7 verdict
    // #7): pcap has no sync markers, so a file cannot be byte-split —
    // instead each of the N shard partitions re-frames the stream
    // (framing runs ~6× faster than dissection) and DISSECTS only its
    // `frameIndex % N` stride. Framing cost is paid N times; the
    // expensive decode splits N ways with no shuffle, taking a
    // decode-bound lone file from 1 core to framing-bound. For many
    // small files leave it at 1 — per-file pipelining already saturates.
    files.sorted.flatMap(f =>
      (0 until decodePartitions).map(i =>
        PcapInputPartition(f, i, decodePartitions): InputPartition)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    PcapReaderFactory(conf, required, refCompat, filters, withBytes)
  }
}

/** THE one path expander shared by the batch scan and the streaming
  * source (the two had drifting hand copies). Globs expand FIRST —
  * `getFileStatus` on a pattern throws before `globStatus` could run, so
  * the old order made glob loads dead code; glob-matched directories
  * expand one level like literal directories. Hidden files (`.`/`_`
  * basenames: in-flight `.tmp` staging from [[PcapWrite]], crashed-task
  * debris, marker siblings) are never data — reading a half-written tmp
  * as pcap fails the whole job (or double-reads frames once the rename
  * lands).
  */
private[sources] object PcapFileEnum {
  def isHidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  def list(paths: Seq[String], hconf: Configuration): Seq[String] = paths.flatMap { p =>
    val path = new Path(p)
    val fs = path.getFileSystem(hconf)
    val stats = fs.globStatus(path) match {
      case null => Seq(fs.getFileStatus(path)) // literal missing path → loud
      case g => g.toSeq
    }
    stats.flatMap(st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st))
      .filter(st => st.isFile && !isHidden(st.getPath.getName))
      .map(_.getPath.toString)
  }.sorted
}

final case class PcapInputPartition(
    file: String, shard: Int = 0, nShards: Int = 1) extends InputPartition

final case class PcapReaderFactory(
    conf: SerializableConfiguration,
    required: StructType,
    refCompat: Boolean,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    withBytes: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PcapInputPartition]
    new PcapPartitionReader(pp.file,
      conf.value, required, refCompat, filters, withBytes, pp.shard, pp.nShards)
  }
}

final class PcapPartitionReader(
    file: String,
    conf: Configuration,
    required: StructType,
    refCompat: Boolean,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    withBytes: Boolean = false,
    shard: Int = 0,
    nShards: Int = 1)
    extends PartitionReader[InternalRow] {

  private val path = new Path(file)
  private val in = path.getFileSystem(conf).open(path)
  private val mode: PcapFramer.Mode =
    if (refCompat) PcapFramer.ReferenceCompat else PcapFramer.Sane
  private val frames = PcapFramer.frames(in, mode)
  private val base = PcapSource.basename(file)
  private val baseUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(base)
  private val pred = PcapFilters.compile(filters, base)
  private val sourceSchema =
    if (withBytes) PacketSchema.bytesSchema else PacketSchema.schema
  // projection map: required ordinal -> source-schema ordinal
  private val ordinals: Array[Int] =
    required.fieldNames.map(sourceSchema.fieldIndex)
  private val identity = ordinals.sameElements(sourceSchema.indices)

  private var current: InternalRow = _
  private var frameIdx: Long = -1L
  private val acc = new graft.dissect.DissectAcc
  private val noFilters = filters.isEmpty

  override def next(): Boolean = {
    while (frames.hasNext) {
      val raw = frames.next()
      frameIdx += 1
      // decode-sharding stride: frames outside this shard are framed
      // (cheap, sequential-scan bound) but never dissected or
      // materialized — see PcapScan.planInputPartitions
      val mine = nShards <= 1 || frameIdx % nShards == shard
      if (mine) {
        PacketDissector.dissectInto(acc, raw)
        // the PacketRow (Option-boxed) form is only materialized when a
        // pushed filter actually needs evaluating
        if (noFilters || pred(acc.toPacketRow)) {
          val dissected = acc.toInternalRow(baseUtf8)
          val fullVals =
            if (withBytes) dissected.values ++ Array[Any](raw.data, raw.linktype)
            else dissected.values
          current =
            if (identity && !withBytes) dissected
            else if (identity)
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fullVals)
            else {
              val vals = new Array[Any](ordinals.length)
              var i = 0
              while (i < ordinals.length) {
                vals(i) = fullVals(ordinals(i))
                i += 1
              }
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
            }
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
