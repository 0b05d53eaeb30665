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
    require(args.length >= 2, "usage: GenCorpus <path> <packets> [ddos|tcp]")
    val mix = if (args.length > 2) args(2) else "ddos"
    graft.spark.PcapGen.write(args(0), args(1).toInt, mix = mix)
    println(s"wrote ${args(1)} packets ($mix) to ${args(0)}")
  }
}
