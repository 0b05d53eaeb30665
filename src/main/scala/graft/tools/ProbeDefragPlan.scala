package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.spark.{Defrag, PcapGen, PcapSource}

/** Diagnostic: print the PHYSICAL plan of both defrag branches on a real
  * pcap frame, plus the frag-stats the adaptive guard sees (row count vs
  * distinct datagram keys — the round-12 question: is the 100M shuffle
  * branch even necessary on key-collided corpora?). Not part of the
  * bench; run ad hoc with `runMain graft.tools.ProbeDefragPlan [packets]`.
  */
object ProbeDefragPlan {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dir =
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft-defrag-probe"
      else "/tmp/graft-defrag-probe"
    Files.createDirectories(Paths.get(dir))
    val p = s"$dir/cap.pcap"
    PcapGen.write(p, n)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pcap = PcapSource.read(spark, p)
    val st = Defrag.fragStats(pcap)
    import org.apache.spark.sql.functions._
    val distinct = pcap
      .filter(col("ip_proto") === 17 && col("ip_mf") && col("ip_frag_offset") === 0)
      .select(Defrag.JoinKeys.map(col): _*).distinct().count()
    System.err.println(s"[probe] total=${st.total} fragmented=${st.fragmented} " +
      s"ffRows=${st.firstFragments} ffDistinctEst=${st.distinctKeysEst} " +
      s"ffDistinctExact=$distinct")
    System.err.println("=== firstFragments plan ===")
    Defrag.firstFragments(pcap).explain("formatted")
    System.err.println("=== broadcast branch ===")
    Defrag.defrag(pcap, broadcastFF = true).explain("formatted")
    System.err.println("=== shuffle branch ===")
    Defrag.defrag(pcap, broadcastFF = false).explain("formatted")
    spark.stop()
  }
}
