package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming over a landing directory of pcap files (SURVEY
  * §2.5's optional extension): each trigger processes the files that
  * appeared since the last committed offset. The offset is the sorted
  * file manifest position — files must be written atomically (rename into
  * the directory), the standard landing-zone contract.
  */
final class PcapMicroBatchStream(
    paths: Seq[String],
    required: org.apache.spark.sql.types.StructType,
    refCompat: Boolean,
    checkpointLocation: String) extends MicroBatchStream {

  private val spark = org.apache.spark.sql.SparkSession.active
  private val hconf = spark.sessionState.newHadoopConf()
  private val serConf = new SerializableConfiguration(hconf)

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

  override def latestOffset(): Offset = PcapOffset(listFiles().size)

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
