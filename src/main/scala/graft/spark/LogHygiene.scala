package graft.spark

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Targeted logger hygiene for the harness mains (Verify/Bench/DumpPlans)
  * and the test session.
  *
  * `WindowExec` warns "No Partition Defined ... serious performance
  * degradation" for EVERY unpartitioned window, including the engine's
  * three deliberate single-task windows over frames that are bounded by
  * construction and do NOT grow with the corpus: GlobalRank's
  * per-partition offsets (≤ numPartitions rows), q56's hour totals
  * (≤ calendar hours), and d36's decile buckets (≤ 10). At gate/bench
  * scale that is ~50 repeated lines of noise that bury real scale smells
  * in the logs the round artifacts capture.
  *
  * The warning is indiscriminate (it cannot see the row bound), so the
  * precise guard lives elsewhere: PlanQualitySpec "single-task windows"
  * enumerates every unpartitioned window in the declared batch surface
  * and fails if one appears outside the audited allowlist. With that
  * compile-time gate in place, the runtime warning carries no extra
  * information and is silenced HERE ONLY (harness entry points) — library
  * users who embed the operators keep Spark's default logging.
  */
object LogHygiene {
  def quietKnownBoundedWindowWarning(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
