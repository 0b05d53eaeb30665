package graft.tools

import java.io.FileInputStream

import graft.core.RawFrame
import graft.dissect.PacketDissector
import graft.pcapio.PcapFramer
import graft.spark.PcapGen

/** Single-thread microbenchmark of the per-packet hot path — dissect +
  * toInternalRow — isolated from Spark scheduling and parquet I/O, so
  * dissector-level optimizations are measurable below the box's ±2×
  * job-level noise. Frames are pre-materialized (framing is benched
  * separately by BenchPcap's parse_pkt_per_s).
  *
  * Usage: runMain graft.tools.BenchDissect [packets] [mix]
  */
object BenchDissect {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val mix = if (args.length > 1) args(1) else "tcp"
    val path = s"/dev/shm/bench_dissect_$mix.pcap"
    PcapGen.write(path, n, mix = mix)
    // framing rate, from an in-memory image (no I/O in the measurement)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val frameRates = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      var c = 0
      val it = PcapFramer.frames(bytes, PcapFramer.Sane)
      while (it.hasNext) { c += use(it.next()); }
      c / ((System.nanoTime() - t0) / 1e9) * 0 + // keep c live
        n / ((System.nanoTime() - t0) / 1e9)
    }.drop(2).sorted
    println(f"mix=$mix framing best=${frameRates.last}%.0f pkt/s " +
      f"median=${frameRates(frameRates.length / 2)}%.0f pkt/s")
    val frames = PcapFramer.frames(new FileInputStream(path), PcapFramer.Sane)
      .toArray
    val file = org.apache.spark.unsafe.types.UTF8String.fromString("bench.pcap")
    var blackhole = 0L
    val acc = new graft.dissect.DissectAcc
    def epoch(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < frames.length) {
        val row = PacketDissector.dissectToInternal(acc, frames(i), file)
        blackhole += row.getLong(0) + (if (row.isNullAt(4)) 1 else 0)
        i += 1
      }
      frames.length / ((System.nanoTime() - t0) / 1e9)
    }
    val rates = (1 to 7).map(_ => epoch())
    // warmup discarded: report best and median of the last 5
    val steady = rates.drop(2).sorted
    println(f"mix=$mix frames=${frames.length} " +
      f"best=${steady.last}%.0f pkt/s median=${steady(steady.length / 2)}%.0f pkt/s " +
      s"(blackhole $blackhole)")
  }

  /** Keep the JIT honest if inlined elsewhere. */
  def use(f: RawFrame): Int = f.data.length
}
