package graft

/** Shared environment knobs for the perf instruments (Bench, TimeQuery,
  * ScaleRehearsal). BenchPcap/BenchCodec place their local dirs inside
  * the synthesized corpus dir instead — that dir already carries its own
  * tmpfs decision.
  */
object BenchEnv {

  /** Shuffle/spill dir on tmpfs when available (round-9 lesson: /tmp
    * rides the virtio disk and adds disk bandwidth + multi-second
    * variance spikes to every shuffle an instrument times).
    */
  def localDir(): String = {
    val d =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm/graft-bench-local"
      else "/tmp/graft-bench-local"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    d
  }
}
