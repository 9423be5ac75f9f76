package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-calibration machinery Bench/BenchScale embed in their artifacts
  * (VERDICT r6 #1: two consecutive rounds' official numbers were silently
  * host-contention-polluted; the probe + inversion fields make a contended
  * run identifiable from the artifact alone).
  */
class BenchCalibrationSpec extends AnyFunSuite {

  test("calibration probe is fixed-work: warm min-of-3 repeats agree within 2x") {
    Bench.calibrationProbe() // JIT warmup, discarded
    // Single probes are legitimately inflated when sibling suites contend
    // for the host (that is what the probe DETECTS); the fixed-work
    // property is the floor, so compare minima — a transient co-tenant
    // inflates individual samples but not both 3-sample minima by 2x.
    val a = Seq.fill(3)(Bench.calibrationProbe()).min
    val b = Seq.fill(3)(Bench.calibrationProbe()).min
    assert(a > 0.05 && a < 30.0, s"probe off-scale: $a s")
    assert(math.max(a, b) / math.min(a, b) < 2.0,
      s"warm probe minima disagree: $a vs $b — fixed work should be stable")
  }

  test("a structurally-inverted ledger forces a retry even with clean probes") {
    // The r13 failure mode verbatim: official run had clean probes
    // (0.604/0.571), attempts:1 — and q7 at 8.9 s vs 4.2 s on 100× the
    // data. classifyInversions must flag it structural and passClean must
    // reject the pass (→ Bench's attempt loop retries).
    val ref = Map("q7_nation_volume" -> 4.2, "q1_agg" -> 1.0, "q_small" -> 0.55)
    val results = Seq(
      ("q7_nation_volume", 8.9), // >1.5x and >0.5s over → structural
      ("q1_agg", 0.9),           // faster than ref → not an inversion
      ("q_small", 0.60))         // slower but inside fixed-cost spread → marginal
    val (count, structural) = Bench.classifyInversions(results, ref)
    assert(count == 2, "q7 and q_small are raw inversions")
    assert(structural == Seq("q7_nation_volume"))
    assert(!Bench.passClean(0.604, 0.571, 0.65, structural.size),
      "clean probes must NOT accept a structurally-inverted pass")
    assert(Bench.passClean(0.604, 0.571, 0.65, 0))
    assert(!Bench.passClean(0.9, 0.5, 0.65, 0), "dirty probe still rejects")
  }

  test("classifyInversions ignores failed reps and missing ref entries") {
    val ref = Map("a" -> 1.0, "b" -> -1.0)
    val results = Seq(("a", -1.0), ("b", 9.0), ("c", 9.0))
    // a failed this run; b failed in the ref; c absent from ref — none count
    assert(Bench.classifyInversions(results, ref) == ((0, Seq.empty)))
  }

  test("inversion gate is directional: a smaller-or-equal-tier ref never gates") {
    // a run at a LARGER dir than the ref would flag most of the registry
    // "inverted" for being physically ordinary; the gate must disable
    // itself instead of burning maxAttempts full passes
    def dirWith(bytes: Int): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_bench_dir")
      java.nio.file.Files.write(d.resolve("t.parquet"), Array.fill(bytes)(0x61.toByte))
      d.toString
    }
    val small = dirWith(1000)
    val big = dirWith(10000)
    assert(Bench.inversionRefEligible(big, small),
      "a genuinely larger ref tier gates")
    assert(!Bench.inversionRefEligible(small, big),
      "a smaller ref tier must not gate a larger run")
    assert(!Bench.inversionRefEligible(small, small + ""),
      "an equal-size ref must not gate")
    // ref dir gone: only the official small-tier run may still gate
    assert(Bench.inversionRefEligible("/tmp/graft_gone_xyz", "/root/testdata/sf0.1"))
    assert(!Bench.inversionRefEligible("/tmp/graft_gone_xyz", big),
      "with the ref dir gone, a non-testdata run must not gate")
  }

  test("scale-stamped ref is judged by its stamp, not tier-dir bytes") {
    // BenchScale stamps "Nx-<baseDir>"; the synthesized dir lives in /tmp
    // and its raw bytes skew with compression/layout (ADVICE r14) — the
    // stamp is the truth. A 10x stamp over this run's own base dir gates;
    // a degenerate 1x stamp must not.
    val base = java.nio.file.Files.createTempDirectory("graft_stamp_base").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "t.parquet"),
      Array.fill(1000)(0x61.toByte))
    assert(Bench.inversionRefEligible(s"10x-$base", base),
      "a 10x-stamped ref over this run's base dir gates")
    assert(!Bench.inversionRefEligible(s"1x-$base", base),
      "a 1x stamp is the same tier — must not gate")
    // stamp over a DIFFERENT dir: multiplier applies to the base's bytes
    val bigger = java.nio.file.Files.createTempDirectory("graft_stamp_big").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(bigger, "t.parquet"),
      Array.fill(5000)(0x61.toByte))
    assert(Bench.inversionRefEligible(s"10x-$base", bigger),
      "10x of 1000B base outweighs a 5000B run dir")
    assert(!Bench.inversionRefEligible(s"2x-$base", bigger),
      "2x of 1000B base does not outweigh a 5000B run dir")
  }

  test("dir-bytes walk skips symlinks: a cycle cannot hang eligibility") {
    val d = java.nio.file.Files.createTempDirectory("graft_link_dir")
    java.nio.file.Files.write(d.resolve("t.parquet"), Array.fill(100)(0x61.toByte))
    try java.nio.file.Files.createSymbolicLink(d.resolve("loop"), d)
    catch { case _: UnsupportedOperationException => cancel("fs lacks symlinks") }
    val other = java.nio.file.Files.createTempDirectory("graft_link_other")
    java.nio.file.Files.write(other.resolve("t.parquet"), Array.fill(1000)(0x61.toByte))
    // would recurse forever (or stack-overflow) without the symlink guard;
    // with it, d counts 100B vs other's 1000B → not eligible
    assert(!Bench.inversionRefEligible(d.toString, other.toString))
    assert(Bench.inversionRefEligible(other.toString, d.toString))
  }

  test("a 2000-char stdout tail always recovers the run's total (r14 capture fix)") {
    // The driver keeps only the LAST ~2000 chars of Bench's stdout. The full
    // per-query record is ~8 KB, so whatever prints last decides what the
    // tail retains. Bench prints: full JSON, then the compact health line.
    // Build the combined stdout exactly as Bench.main does and slice it.
    val qs = (1 to 159).map(i => s""""q${"%03d".format(i)}_operator_name_of_typical_length":${i % 7}.${i % 997}""")
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":94.613,"unit":"sec","reps":3,"agg":"min","action":"noop","contended":false,"inverted":false,"attempts":1,"calibration":{"before":0.627,"after":0.609},"inversions":null,"queries":$qs,"queries_median":$qs,"sf":"/root/testdata/sf0.1"}"""
    assert(fullJson.length > 4000, "fixture must model the real ~8KB record")
    val health = Bench.healthLine(0.627, 0.609, 94.613, 3, 159,
      extra = ""","contended":false,"inverted":false,"attempts":1""")
    assert(health.length < 400, s"health line must survive any tail: ${health.length}")
    val stdout = fullJson + "\n" + health + "\n"
    val tail = stdout.takeRight(2000)
    // roundcheck.py's exact rescue key: the health line's total
    val m = """"health"\s*:\s*\{.*?"total"\s*:\s*([\d.]+)""".r
      .findFirstMatchIn(tail)
    assert(m.isDefined, s"health line missing from the 2000-char tail: ...${tail.takeRight(300)}")
    assert(m.get.group(1) == "94.613",
      "the recovered total must key the full record in bench_history.jsonl")
  }

  test("readBenchArtifact parses both sf- and scale-keyed artifacts") {
    val f = java.io.File.createTempFile("bench", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"metric":"total_sf1","value":1.0,"scale":"10x-/x/sf0.1","queries":{"q1":0.5,"q2":-1.0}}""")
    val (sf, qs) = Bench.readBenchArtifact(f)
    assert(sf == "10x-/x/sf0.1")
    assert(qs == Map("q1" -> 0.5, "q2" -> -1.0))

    val g = java.io.File.createTempFile("bench", ".json")
    g.deleteOnExit()
    java.nio.file.Files.writeString(g.toPath,
      """{"metric":"total","value":1.0,"sf":"/x/sf0.1","queries":{"q1":0.4}}""")
    assert(Bench.readBenchArtifact(g)._1 == "/x/sf0.1")
  }

  test("quietOrWeather: steady elevated floor is weather — line rises, stamped") {
    // 8 consecutive settled probes inside a ±6% band above the ledger line:
    // hypervisor weather, not a co-tenant burst. Line = floor × 1.18, and
    // the measured floor itself is carried for the artifact's probe_floor
    // stamp (roundcheck re-derives the line from it).
    val g = Bench.quietOrWeather(0.65, maxWaits = 40, sleepMs = 0,
      probe = () => 0.70)
    assert(g.weather)
    assert(math.abs(g.floor - 0.70) < 1e-9)
    assert(math.abs(g.line - g.floor * Bench.WeatherLineMult) < 1e-9)
    assert(g.probe <= g.line)
  }

  test("weather constants are mirrored verbatim in tools/roundcheck.py") {
    // roundcheck (Python) cannot import Bench's constants, so the weather
    // multiplier, drift band, and cap are duplicated there; this pins the
    // copies together (ADVICE r15: a silent drift between them would let
    // the two adjudicators disagree about the same artifact).
    val py = java.nio.file.Files.readString(
      java.nio.file.Paths.get("tools/roundcheck.py"))
    assert(py.contains(s"WEATHER_LINE_MULT = ${Bench.WeatherLineMult}"),
      s"roundcheck.py must define WEATHER_LINE_MULT = ${Bench.WeatherLineMult}")
    assert(py.contains(s"AFTER_DRIFT_BAND = ${Bench.AfterDriftBand}"),
      s"roundcheck.py must define AFTER_DRIFT_BAND = ${Bench.AfterDriftBand}")
    assert(py.contains(s"WEATHER_CAP = ${Bench.WeatherCap}"),
      s"roundcheck.py must define WEATHER_CAP = ${Bench.WeatherCap}")
    assert(py.contains(s"IO_LINE_MULT = ${Bench.IoLineMult}"),
      s"roundcheck.py must define IO_LINE_MULT = ${Bench.IoLineMult}")
  }

  test("io quiet-floor ledger: floor/line from history, verdict in the stamp") {
    val f = java.io.File.createTempFile("graft_hist", ".jsonl")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, Seq(
      """{"io_probe":{"before":0.120,"after":0.130}}""",
      """not json at all""",
      """{"metric":"total","io_probe":null}""",
      """{"io_probe":{"before":0.090,"after":0.150}}""").mkString("\n"))
    val ledger = Bench.ioQuietLedger(f.getPath)
    assert(ledger.isDefined, "4 stamped samples reach IoMinLedger")
    val (floor, line) = ledger.get
    assert(floor == 0.09 && math.abs(line - 0.09 * Bench.IoLineMult) < 1e-9)
    // too-shallow history: no line yet (first rounds of the ledger)
    val g = java.io.File.createTempFile("graft_hist2", ".jsonl")
    g.deleteOnExit()
    java.nio.file.Files.writeString(g.toPath,
      """{"io_probe":{"before":0.1,"after":0.1}}""")
    assert(Bench.ioQuietLedger(g.getPath).isEmpty)
    assert(Bench.ioQuietLedger("/nonexistent/path.jsonl").isEmpty)
    // the stamp: weather_io takes the MIN of the bracket (one writeback
    // burst must not stamp the run); no ledger -> raw bracket only
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hot = mapper.readTree(Bench.ioJson(0.4, 0.5, Some((0.09, 0.27))))
    assert(hot.path("weather_io").asBoolean() && hot.path("line").asDouble() == 0.27)
    val burst = mapper.readTree(Bench.ioJson(0.4, 0.1, Some((0.09, 0.27))))
    assert(!burst.path("weather_io").asBoolean())
    val bare = mapper.readTree(Bench.ioJson(0.1, 0.1, None))
    assert(bare.path("floor").isMissingNode && bare.path("before").asDouble() == 0.1)
  }

  test("bytes cache round-trips, rejects a mismatched key (VERDICT r17 #1)") {
    val f = java.io.File.createTempFile("graft_bcache", ".json")
    f.deleteOnExit()
    Bench.writeBytesCache("k1", "/sf", "noop", Map("q1" -> 42L, "q2" -> 7L),
      f.getPath)
    assert(Bench.readBytesCache("k1", f.getPath)
      .contains(Map("q1" -> 42L, "q2" -> 7L)))
    assert(Bench.readBytesCache("k2", f.getPath).isEmpty,
      "a stale key must force a fresh byte pass")
    assert(Bench.readBytesCache("k1", "/nonexistent/cache.json").isEmpty)
  }

  test("bytesCacheKey: stable across calls, sensitive to code/data/action/registry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_dir")
    java.nio.file.Files.writeString(dir.resolve("t.parquet"), "x")
    val k1 = Bench.bytesCacheKey(dir.toString, "noop", Seq("a", "b"))
    assert(k1 == Bench.bytesCacheKey(dir.toString, "noop", Seq("a", "b")),
      "same inputs must fingerprint identically (mtime-free class signature)")
    assert(k1 != Bench.bytesCacheKey(dir.toString, "count", Seq("a", "b")))
    assert(k1 != Bench.bytesCacheKey(dir.toString, "noop", Seq("a", "b", "c")))
    // a regenerated fixture (new mtime, even same size) must invalidate
    val t = dir.resolve("t.parquet").toFile
    assert(t.setLastModified(t.lastModified + 5000))
    assert(k1 != Bench.bytesCacheKey(dir.toString, "noop", Seq("a", "b")))
  }

  test("artifactJson stamps forensics arrays, io verdict, and bytes_cached") {
    val o = Bench.GatedOutcome(Seq(("q1", 1.0, 1.1)), 0.6, 0.61, 0.65, 0.65,
      weather = false, attempts = 1, repsUsed = 2, degraded = false,
      invCount = 0, structural = Seq.empty)
    val stage = Map("q1" -> Seq(Seq(10L, 9L, 1L, 0L, 0L, 0L, 100L, 5000L),
      Seq(33L, 30L, 2L, 0L, 0L, 0L, 100L, 5000L)))
    val j = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Bench.artifactJson(o, "noop", Map("q1" -> 1L), "sf", None, 100.0,
        io = Some((0.4, 0.5)), ioLedger = Some((0.09, 0.27)),
        stage = stage, bytesCached = true))
    assert(j.path("bytes_cached").asBoolean())
    assert(j.path("io_probe").path("weather_io").asBoolean())
    assert(j.path("forensics_keys").size() == Bench.ForensicsKeys.size)
    assert(j.path("forensics_keys").get(0).asText() == "run_ms")
    val reps = j.path("forensics").path("q1")
    assert(reps.size() == 2 && reps.get(1).get(0).asLong() == 33L)
  }

  test("BenchScale.validFor: stamp-gated superset reuse (ADVICE r17)") {
    val src = java.nio.file.Files.createTempDirectory("graft_vf_src")
    java.nio.file.Files.writeString(src.resolve("documents.parquet"), "d")
    java.nio.file.Files.writeString(src.resolve("embeddings.parquet"), "e")
    val out = java.nio.file.Files.createTempDirectory("graft_vf_out")
    // bare file existence is NOT enough: no _DONE stamp -> invalid
    java.nio.file.Files.writeString(out.resolve("embeddings.parquet"), "z")
    assert(!BenchScale.validFor(out.toString, src.toString, 10, Seq("embeddings")))
    java.nio.file.Files.writeString(out.resolve("_DONE"),
      BenchScale.stampFor(src.toString, 10, Seq("documents", "embeddings")) + "\n")
    assert(BenchScale.validFor(out.toString, src.toString, 10,
      Seq("documents", "embeddings")))
    assert(BenchScale.validFor(out.toString, src.toString, 10, Seq("embeddings")),
      "a stamped SUPERSET serves any subset")
    assert(!BenchScale.validFor(out.toString, src.toString, 100, Seq("embeddings")),
      "a different SCALE_REPS is different data")
    assert(!BenchScale.validFor(out.toString, src.toString, 10, Seq("events")),
      "a table outside the stamped set is absent")
    // fixture regeneration (new mtime) invalidates even at equal size
    val doc = src.resolve("documents.parquet").toFile
    assert(doc.setLastModified(doc.lastModified + 5000))
    assert(!BenchScale.validFor(out.toString, src.toString, 10, Seq("embeddings")))
  }

  test("quietOrWeather: a transient burst is outwaited, ledger line kept") {
    val seq = Iterator(0.92, 0.88, 0.61) ++ Iterator.continually(0.60)
    val g = Bench.quietOrWeather(0.65, maxWaits = 40, sleepMs = 0,
      probe = () => seq.next())
    assert(!g.weather)
    assert(g.line == 0.65)
    assert(g.probe <= 0.65)
  }

  test("quietOrWeather: oscillating probes are contention, never weather") {
    // Variance outside the band for the whole wait: a co-tenant burst
    // pattern. The gate must exhaust its waits and return dirty at the
    // ledger line, not wash the run as weather.
    var i = 0
    val g = Bench.quietOrWeather(0.65, maxWaits = 12, sleepMs = 0,
      probe = () => { i += 1; if (i % 2 == 0) 0.70 else 0.95 })
    assert(!g.weather)
    assert(g.line == 0.65)
    assert(g.probe > 0.65)
  }

  test("quietOrWeather: a floor above WeatherCap is refused — too slow to measure") {
    val g = Bench.quietOrWeather(0.65, maxWaits = 12, sleepMs = 0,
      probe = () => 1.2)
    assert(!g.weather)
    assert(g.line == 0.65)
  }

  test("hostFactor normalizes cross-weather inversion refs, clamped [1, 1.5]") {
    // slow-weather run (probe floor 0.80) vs fast-weather ref (0.60): scale
    // up — by the MIN of this run's probes, the same statistic
    // readArtifactProbe takes from the ref (ADVICE r15: mean-vs-min meant
    // hf > 1 even on a like-speed host).
    assert(math.abs(Bench.hostFactor(0.80, 0.84, Some(0.60)) - 80.0 / 60.0) < 1e-9)
    // identical conditions (same floor as the ref): exactly 1.0.
    assert(Bench.hostFactor(0.60, 0.73, Some(0.60)) == 1.0)
    // like-speed host: never relaxes.
    assert(Bench.hostFactor(0.58, 0.62, Some(0.60)) == 1.0)
    // beyond 1.5x the ref's speed: clamp — too slow to adjudicate leniently.
    assert(Bench.hostFactor(1.3, 1.3, Some(0.60)) == 1.5)
    // no stamped ref probe: no scaling.
    assert(Bench.hostFactor(0.9, 0.9, None) == 1.0)
  }

  test("readArtifactProbe reads the ref's stamped probe floor") {
    val f = java.io.File.createTempFile("bench_probe", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"metric":"total","calibration":{"before":0.62,"after":0.59},"queries":{}}""")
    assert(Bench.readArtifactProbe(f).contains(0.59))
    val g = java.io.File.createTempFile("bench_noprobe", ".json")
    g.deleteOnExit()
    java.nio.file.Files.writeString(g.toPath, """{"metric":"total","queries":{}}""")
    assert(Bench.readArtifactProbe(g).isEmpty)
  }

  test("after-probe drift band: idle noise passes, a mid-pass co-tenant fails") {
    // before clean at 0.63; after 0.70 is +11% — inside measured idle noise.
    assert(Bench.passClean(0.63, 0.70, 0.65, 0))
    // after 1.0 is a mid-pass arrival signature — rejected.
    assert(!Bench.passClean(0.63, 1.0, 0.65, 0))
    // the band never relaxes the BEFORE line.
    assert(!Bench.passClean(0.70, 0.63, 0.65, 0))
  }

  test("settledProbe discards a one-off GC pause: min of two runs") {
    // One dirty run (GC debt from the pass that just finished) must not
    // read as host contention: only a co-tenant dirties BOTH runs.
    val seq = Iterator(0.97, 0.61)
    assert(Bench.settledProbe(() => seq.next()) == 0.61)
    val contended = Iterator(0.93, 0.95)
    assert(Bench.settledProbe(() => contended.next()) == 0.93)
  }
}
