package graft.spark

import org.apache.spark.sql.SparkSession

import graft.pcapio.PcapFramer

/** CLI parity with the reference converter
  * (`pcap-converter -f in.pcap -o out.parquet [-n] [-j N] [-v]`,
  * reference src/main.rs:22-43): pcap/pcapng → dissect → optional defrag →
  * snappy Parquet.
  */
object PcapConvert {

  final case class Args(
      file: String = "",
      out: String = "",
      nodefrag: Boolean = false,
      jobs: Int = 0, // 0 = let Spark decide (per-file tasks)
      verbose: Boolean = false,
      debug: Boolean = false,
      singleFile: Boolean = true,
      referenceCompat: Boolean = false,
      cache: Boolean = false)

  def parse(argv: Array[String]): Args = {
    @annotation.tailrec
    def loop(rest: List[String], a: Args): Args = rest match {
      case "-f" :: v :: t            => loop(t, a.copy(file = v))
      case "--file" :: v :: t        => loop(t, a.copy(file = v))
      case "-o" :: v :: t            => loop(t, a.copy(out = v))
      case "--out" :: v :: t         => loop(t, a.copy(out = v))
      case ("-n" | "--nodefrag") :: t => loop(t, a.copy(nodefrag = true))
      case "-j" :: v :: t            => loop(t, a.copy(jobs = v.toInt))
      case ("-v" | "--verbose") :: t => loop(t, a.copy(verbose = true))
      case ("-d" | "--debug") :: t   => loop(t, a.copy(debug = true))
      case "--multi-file" :: t       => loop(t, a.copy(singleFile = false))
      case "--cache" :: t            => loop(t, a.copy(cache = true))
      case "--reference-compat" :: t => loop(t, a.copy(referenceCompat = true))
      case Nil                       => a
      case x :: _ => throw new IllegalArgumentException(s"unknown arg: $x")
    }
    val a = loop(argv.toList, Args())
    require(a.file.nonEmpty && a.out.nonEmpty, "usage: -f <in.pcap> -o <out.parquet>")
    a
  }

  def run(spark: SparkSession, a: Args): Unit = {
    if (a.debug) spark.sparkContext.setLogLevel("DEBUG")
    val mode: PcapFramer.Mode =
      if (a.referenceCompat) PcapFramer.ReferenceCompat else PcapFramer.Sane
    val m = PcapSource.metrics(spark)
    val parsed = PcapSource
      .read(spark, a.file, mode, decodePartitions = a.jobs, metrics = Some(m))
    // the streaming parser is cheap enough that re-parsing per pass beats
    // caching the wide packet table; --cache opts in when memory is ample.
    // (Round-2 measured the alternative — the reference's parquet-first
    // temp-copy flow, write → stats over parquet → defrag rewrite: at 2M
    // packets the 31-col parquet WRITE costs ~2.6x a parse, so writing
    // twice loses to re-parsing; plan-driven stays the default.)
    val pcap = if (a.cache) parsed.cache() else parsed
    // live progress (reference parity, src/statswriter.rs:64-68): the
    // accumulators tick as tasks finish, so a long 100 TB conversion shows
    // a running count instead of one number at the end
    val progress =
      if (!a.verbose) None
      else Some {
        val th = new Thread(() => {
          try {
            while (!Thread.currentThread().isInterrupted) {
              Thread.sleep(2000)
              System.err.println(
                s"Packets: ${m.packets.value} Errors: ${m.errors.value}")
            }
          } catch { case _: InterruptedException => () }
        }, "pcap-progress")
        th.setDaemon(true)
        th.start()
        th
      }
    try {
      val out =
        if (a.nodefrag) pcap
        else Defrag(pcap) // adaptive: joins only when >= 1% fragmented
      PcapSource.write(out, a.out, a.singleFile)
    } finally progress.foreach(_.interrupt())
    if (a.verbose)
      System.err.println(
        s"Packets: ${m.packets.value} Errors: ${m.errors.value}")
    if (a.cache) pcap.unpersist()
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val builder = SparkSession.builder()
      .appName("pcap-convert")
      .config("spark.sql.session.timeZone", "UTC")
    // default to local mode when not launched via spark-submit
    if (!sys.props.contains("spark.master") && !sys.env.contains("MASTER"))
      builder.master("local[*]").config("spark.sql.shuffle.partitions", "32")
    val spark = builder.getOrCreate()
    try run(spark, a)
    finally spark.stop()
  }
}
