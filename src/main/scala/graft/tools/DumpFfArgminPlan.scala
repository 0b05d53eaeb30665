package graft.tools

/** Writes plans/r17 ff-argmin plan dumps: `before` = the r16 shipped
  * MinStructAgg/ObjectHashAggregate form (forced via
  * `graft.agg.ffMinStruct`), `after` = the round-17 declarative
  * SortAggregate default. Usage:
  * `runMain graft.tools.DumpFfArgminPlan [pcapFile] [outDir]`.
  */
object DumpFfArgminPlan {
  def main(args: Array[String]): Unit = {
    val file = args.headOption.getOrElse("/dev/shm/graft-pcap-bench/cap0.pcap")
    val outDir = if (args.length > 1) args(1) else "plans/r17"
    val spark = graft.BenchEnv.abSession()
    val pcap = spark.read.format("pcap").load(file)
    def dump(name: String): Unit = {
      val ff = graft.spark.Defrag.firstFragments(pcap)
      val txt = ff.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/$name")
    }
    sys.props("graft.agg.ffMinStruct") = "1"
    dump("ff_argmin_before.txt") // r16 shipped form
    sys.props.remove("graft.agg.ffMinStruct")
    dump("ff_argmin_after.txt") // round-17 declarative default
    spark.stop()
  }
}
