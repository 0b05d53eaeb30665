package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming over a landing directory of pcap files (SURVEY
  * §2.5's optional extension): each trigger processes the files that
  * appeared since the last committed offset. The offset is the sorted
  * file manifest position — files must be written atomically (rename into
  * the directory), the standard landing-zone contract.
  *
  * Implements [[SupportsTriggerAvailableNow]] (round-7, VERDICT r6 #5):
  * without it, `Trigger.AvailableNow` falls back to a SINGLE batch of
  * everything — which weakens the processing guarantee on restart (an
  * uncommitted giant batch replays in full, and admission control is
  * ignored). With it, `prepareForTriggerAvailableNow` pins the target
  * file count at query start and every batch advances toward that fence
  * under the declared read limit (`maxFilesPerTrigger` option), exactly
  * like Spark's own file source.
  */
final class PcapMicroBatchStream(
    paths: Seq[String],
    required: org.apache.spark.sql.types.StructType,
    refCompat: Boolean,
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = org.apache.spark.sql.SparkSession.active
  private val hconf = spark.sessionState.newHadoopConf()
  private val serConf = new SerializableConfiguration(hconf)

  /** AvailableNow fence: files beyond this count (they arrived after the
    * query started) are left for the NEXT run — the trigger's contract.
    */
  @volatile private var availableNowCap: Option[Int] = None

  private def listFiles(): Seq[String] = paths.flatMap { p =>
    val path = new Path(p)
    val fs = path.getFileSystem(hconf)
    val stats =
      if (fs.getFileStatus(path).isDirectory) fs.listStatus(path).toSeq
      else fs.globStatus(path) match {
        case null => Seq(fs.getFileStatus(path))
        case g => g.toSeq
      }
    stats.filter(_.isFile).map(_.getPath.toString)
  }.sorted

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listFiles().size)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission-controlled batch end: everything available (capped by the
    * AvailableNow fence when set), bounded by the read limit from start.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PcapOffset].fileCount
    val avail = availableNowCap.getOrElse(listFiles().size)
    val e = limit match {
      case mf: ReadMaxFiles => math.min(avail, s + mf.maxFiles())
      case _ => avail
    }
    PcapOffset(math.max(s, e))
  }

  override def reportLatestOffset(): Offset = PcapOffset(listFiles().size)

  // a SupportsAdmissionControl source is always asked through
  // latestOffset(start, limit); the legacy form must never be called
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "PcapMicroBatchStream uses latestOffset(Offset, ReadLimit)")

  override def initialOffset(): Offset = PcapOffset(0)

  override def deserializeOffset(json: String): Offset =
    PcapOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PcapOffset].fileCount
    val e = end.asInstanceOf[PcapOffset].fileCount
    listFiles().slice(s, e).map(f => PcapInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    PcapReaderFactory(serConf, required, refCompat)

  override def stop(): Unit = ()
}

final case class PcapOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}
