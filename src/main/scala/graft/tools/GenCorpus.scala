package graft.tools

/** Standalone corpus generator for the differential / bench recipes:
  * `runMain graft.tools.GenCorpus <path> <packets> [ddos|tcp]` — the
  * same deterministic [[graft.spark.PcapGen]] mixes the benches use,
  * without running a bench. A ddos-mix corpus ≳ 2M packets wraps the
  * 16-bit ip_id space (keys collide), which is what
  * tools/defrag_differential.py's collided-key arm needs to exercise.
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--bench-corpus")) {
      // replicate BenchPcap's corpus layout (cap0..7 + MANIFEST, same
      // per-file ts bases) so the A/B instruments can run without first
      // paying a full BenchPcap pass
      val dir = args(1); val n = args(2).toInt; val files = 8
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      (0 until files).foreach { f =>
        graft.spark.PcapGen.write(s"$dir/cap$f.pcap", n / files,
          1700000000000000L + f * 1000000L)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "MANIFEST"),
        s"n=$n files=$files".getBytes("UTF-8"))
      println(s"wrote bench corpus n=$n files=$files to $dir")
      return
    }
    require(args.length >= 2, "usage: GenCorpus <path> <packets> [ddos|tcp]")
    val mix = if (args.length > 2) args(2) else "ddos"
    graft.spark.PcapGen.write(args(0), args(1).toInt, mix = mix)
    println(s"wrote ${args(1)} packets ($mix) to ${args(0)}")
  }
}
