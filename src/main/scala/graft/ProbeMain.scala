package graft

/** Host-calibration utility: prints N settled probe values so the ledger
  * line (Bench PROBE_MAX / tools/roundcheck.py) can be re-derived on a
  * quiet host after any probe-implementation change. Run SOLO:
  * `sbt -batch "runMain graft.ProbeMain [n]"`.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    Bench.calibrationProbe() // JIT warmup, discarded
    val vals = (1 to n).map { i =>
      val v = Bench.settledProbe()
      println(f"probe[$i] = $v%.4f s")
      v
    }
    println(f"min=${vals.min}%.4f median=${vals.sorted.apply(n / 2)}%.4f max=${vals.max}%.4f")
  }
}
