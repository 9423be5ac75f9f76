#!/usr/bin/env python3
"""Round-start sanity check over the driver's artifacts. Run this FIRST each
round — it catches the round-8 failure mode (driver-side fixture drift
silently knocking gates out of the correctness file) in one glance.

    python3 tools/roundcheck.py            # auto-detect latest two rounds
    python3 tools/roundcheck.py 9          # compare r09 vs r08 explicitly

Checks:
  1. CORRECTNESS_r{n} vs r{n-1} key sets — any query that disappeared
     means it ERRORED at read (the driver drops erroring gates entirely).
  2. Any non-green row (rows/schema/hash mismatch) in CORRECTNESS_r{n}.
  3. BENCH_r{n} for -1.000 sentinels (all-reps-failed) and structural
     inversions the self-calibrating bench recorded.
  4. Tier-artifact health (r10 VERDICT #1): any committed tier artifact
     stamped contended or whose calibration probe exceeds PROBE_MAX is
     measurement garbage and fails the check.
  5. Growth exponents recomputed from the committed artifacts themselves
     (not asserted in prose): for each adjacent tier pair, per-query growth
     must stay under (data ratio)^1.2 — the same super-linear line
     tools/growth.py draws — for every query whose hi-tier time is big
     enough to be signal (>1 s).
Exit code 1 if anything is wrong.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rounds():
    rs = []
    for p in glob.glob(f"{ROOT}/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            rs.append(int(m.group(1)))
    return sorted(rs)


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


DIAG_RE = re.compile(r"_(nogc|diag[a-z0-9_]*)\.json$")


def is_diagnostic(path):
    """Diagnostic A/B artifacts (e.g. *_nogc: periodic GC pushed past the
    run for the r16 MinHash adjudication) intentionally alter the run
    configuration; they are evidence for their A/B conclusion, NOT gating
    tier numbers — sweeping them into the health/growth globs lets an
    intentionally-degraded diagnostic flag a round whose official artifacts
    are clean (ADVICE r16)."""
    return bool(DIAG_RE.search(os.path.basename(path)))


def main():
    rs = rounds()
    if not rs:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    cur = int(sys.argv[1]) if len(sys.argv) > 1 else rs[-1]
    prev = max((r for r in rs if r < cur), default=None)
    bad = False

    cc = load(f"{ROOT}/CORRECTNESS_r{cur:02d}.json")
    if cc is None and prev is not None and \
            glob.glob(f"{ROOT}/BENCH_r{cur:02d}_*.json"):
        # builder-side mid-round check: the round's tier artifacts exist but
        # the driver hasn't produced this round's correctness file yet — use
        # the previous round's registry as the coverage reference (new gates
        # added this round are absent from it, which only makes the tier
        # coverage check stricter in the other direction)
        cc = load(f"{ROOT}/CORRECTNESS_r{prev:02d}.json")
        if cc is not None:
            print(f"(CORRECTNESS_r{cur:02d}.json not written yet — checking "
                  f"r{cur:02d} tier artifacts against the r{prev:02d} registry)")
            prev = None  # the vanished/new diff below would be self-comparison
    if cc is None:
        print(f"CORRECTNESS_r{cur:02d}.json missing")
        return 1
    print(f"== CORRECTNESS: {len(cc)} queries")

    if prev is not None:
        cp = load(f"{ROOT}/CORRECTNESS_r{prev:02d}.json") or {}
        gone = sorted(set(cp) - set(cc))
        new = sorted(set(cc) - set(cp))
        if gone:
            bad = True
            print(f"!! {len(gone)} queries VANISHED since r{prev:02d} "
                  f"(they errored at read): {', '.join(gone)}")
        if new:
            print(f"   {len(new)} new since r{prev:02d}: {', '.join(new)}")

    red = sorted(n for n, r in cc.items()
                 if not (r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match")))
    if red:
        bad = True
        for n in red:
            print(f"!! non-green: {n}: {cc[n]}")
    else:
        print(f"   all {len(cc)} rows green")

    # The driver's BENCH_r{n}.json wraps the Bench stdout line as a
    # (truncated) `tail` string with `parsed` often null; the builder's
    # bench_last.json is the full JSON line. Scan whichever text we have.
    bench = load(f"{ROOT}/BENCH_r{cur:02d}.json")
    if bench is None:
        print(f"   (no BENCH_r{cur:02d}.json)")
    else:
        # Prefer STRUCTURED inspection of whichever full dict exists — a
        # regex over json.dumps output is brittle (default dumps inserts a
        # space after ':', which silently killed these checks once). The
        # regex path exists ONLY for the driver's truncated-tail string.
        full = None
        if isinstance(bench, dict):
            if isinstance(bench.get("queries"), dict):
                full = bench
            elif isinstance(bench.get("parsed"), dict) and \
                    isinstance(bench["parsed"].get("queries"), dict):
                full = bench["parsed"]
        if full is None:
            # Truncated official artifact (the r11/r12 blemish): try the
            # durable history Bench appends every full JSON line to —
            # the health line's suite total (always inside the captured
            # tail) uniquely keys the run. A rescue is reported; NO full
            # record anywhere is a FAILURE, not a shrug: a round whose
            # official per-query numbers exist nowhere cannot be judged.
            text = bench.get("tail", "") if isinstance(bench, dict) else ""
            mh = re.search(r'"health"\s*:\s*\{.*?"total"\s*:\s*([\d.]+)', text)
            want_total = mh.group(1) if mh else None
            newest = None  # newest full history record, whatever its total
            try:
                with open(f"{ROOT}/bench_history.jsonl") as f:
                    for line in f:
                        try:
                            rec = json.loads(line)
                        except ValueError:
                            continue
                        if not isinstance(rec.get("queries"), dict):
                            continue
                        newest = rec
                        if want_total is not None and \
                                f'{rec.get("value", -1):.3f}' == want_total:
                            full = rec  # last match wins (newest run)
            except FileNotFoundError:
                pass
            if full is not None:
                print(f"   BENCH r{cur:02d} tail truncated — full line "
                      f"rescued from bench_history.jsonl (total {want_total}s)")
            else:
                # Fallback chain (r14 VERDICT #1 / r17 #1): Bench writes the
                # complete record to BENCH_official_latest.json (official
                # posture only — builder runs never clobber it) and to
                # bench_last.json (every run) BEFORE printing, so when the
                # tail kept no health line at all, accept either — provided
                # it matches the tail's total (if any survived) or the
                # newest bench_history line (agreeing with the newest
                # history line proves it IS the newest run, not stale).
                for cand in ("BENCH_official_latest.json", "bench_last.json"):
                    bl = load(f"{ROOT}/{cand}")
                    if not (isinstance(bl, dict) and
                            isinstance(bl.get("queries"), dict)):
                        continue
                    matches_tail = want_total is not None and \
                        f'{bl.get("value", -1):.3f}' == want_total
                    matches_hist = newest is not None and \
                        bl.get("value") == newest.get("value") and \
                        bl.get("queries") == newest.get("queries")
                    if matches_tail or matches_hist:
                        full = bl
                        why = "tail total" if matches_tail else \
                            "newest bench_history line"
                        print(f"   BENCH r{cur:02d} tail truncated — full "
                              f"record rescued from {cand} "
                              f"(matches {why}, total {bl.get('value')}s)")
                        break
        if full is not None:
            if full.get("degraded") is True:
                # budget-degraded run (r16 #1): the wall-clock budget cut
                # reps or skipped retries so an artifact ALWAYS exists.
                # Numbers are floor-quality methodology (reps recorded in
                # the artifact), honest stamps — a note, not a failure.
                print(f"?? BENCH r{cur:02d} stamped degraded=true "
                      f"(reps={full.get('reps')}, "
                      f"attempts={full.get('attempts')}) — the wall-clock "
                      f"budget reduced methodology to guarantee an artifact")
            failed = sorted(n for n, v in full["queries"].items() if v < 0)
            inv = full.get("inversions") or {}
            structural = inv.get("structural", 0) if isinstance(inv, dict) else 0
            names = inv.get("structural_names", []) if isinstance(inv, dict) else []
            total = full.get("value", "?")
        else:
            bad = True
            print(f"!! BENCH_r{cur:02d}.json is truncated and no full record "
                  f"matches in bench_history.jsonl — the round's per-query "
                  f"numbers are lost; fix the capture")
            text = bench.get("tail", "") if isinstance(bench, dict) else ""
            failed = sorted(set(re.findall(r'"(\w+)"\s*:\s*-1\.0', text)))
            m = re.search(r'"structural"\s*:\s*(\d+)', text)
            structural = int(m.group(1)) if m else 0
            mn = re.search(r'"structural_names"\s*:\s*(\[[^\]]*\])', text)
            names = mn.group(1) if mn else []
            mt = re.search(r'"metric"\s*:\s*"total[^"]*"\s*,\s*"value"\s*:\s*([\d.]+)', text)
            total = mt.group(1) if mt else "?"
        if failed:
            bad = True
            print(f"!! {len(failed)} bench queries at -1.000 (all reps "
                  f"failed): {', '.join(failed)}")
        if structural:
            bad = True
            print(f"!! {structural} structural bench inversions: {names}")
        if full is not None and full.get("inverted") is True:
            bad = True
            print(f"!! BENCH_r{cur:02d} is stamped inverted=true — Bench "
                  f"retried and the inversions persisted; the artifact is "
                  f"refused as the round's number")
        print(f"== BENCH r{cur:02d}: total {total}s"
              f" ({'full' if full else 'truncated tail'} artifact)")

    # Tier artifacts must account for the whole gate registry: every gate in
    # CORRECTNESS must appear in the tier's `queries` or its `excluded`
    # list, else the tier silently narrowed (r9 VERDICT #3 — four late
    # gates were absent from BENCH_r09_sf10.json with only one recorded).
    for tier in sorted(glob.glob(f"{ROOT}/BENCH_r{cur:02d}_sf*.json")):
        if is_diagnostic(tier):
            continue
        art = load(tier)
        if not isinstance(art, dict) or not isinstance(art.get("queries"), dict):
            continue
        covered = set(art["queries"]) | set(art.get("excluded") or [])
        missing = sorted(set(cc) - covered)
        if missing:
            bad = True
            print(f"!! {os.path.basename(tier)} silently narrows: "
                  f"{len(missing)} registered gates neither timed nor "
                  f"excluded: {', '.join(missing)}")
        # a -1.0 sentinel (all reps failed) is only legitimate when the
        # gate is ALSO declared excluded (the targeted-tables tiers record
        # non-runnable gates that way); a failed-but-undeclared gate is a
        # crash hiding inside a "clean" artifact
        neg = sorted(q for q, v in art["queries"].items()
                     if isinstance(v, (int, float)) and v < 0)
        excl = set(art.get("excluded") or [])
        undeclared = [q for q in neg if q not in excl]
        if undeclared:
            bad = True
            print(f"!! {os.path.basename(tier)}: {len(undeclared)} queries "
                  f"failed all reps (-1) WITHOUT being declared excluded: "
                  f"{', '.join(undeclared)}")
        if not missing and not undeclared:
            timed = sum(1 for v in art["queries"].values()
                        if isinstance(v, (int, float)) and v >= 0)
            extra = f", {len(neg)} declared-excluded -1s" if neg else ""
            print(f"   {os.path.basename(tier)}: registry fully accounted "
                  f"({timed} timed, "
                  f"{len(art.get('excluded') or [])} excluded{extra})")

    # 4. Tier-artifact health: contended stamp / dirty calibration probes.
    PROBE_MAX = 0.65  # matches BenchScale's gate; ledger norm ~0.55-0.6
    # Mirrors of Bench.scala's weather constants (Python cannot import
    # them; BenchCalibrationSpec asserts these exact definitions exist so
    # the two adjudicators cannot silently drift — ADVICE r15):
    WEATHER_LINE_MULT = 1.18  # Bench.WeatherLineMult (floor -> line)
    AFTER_DRIFT_BAND = 1.15   # Bench.AfterDriftBand (after-probe allowance)
    WEATHER_CAP = 1.0         # Bench.WeatherCap (floor beyond this: refused)
    IO_LINE_MULT = 3.0        # Bench.IoLineMult (fsync floor -> line)
    tier_paths = sorted(glob.glob(f"{ROOT}/BENCH_r{cur:02d}_sf*.json")) + \
        sorted(glob.glob(f"{ROOT}/BENCH_r{cur:02d}_builder_sf*.json"))
    diag = [t for t in tier_paths if is_diagnostic(t)]
    for t in diag:
        print(f"   (diagnostic artifact {os.path.basename(t)} excluded from "
              f"gating — A/B evidence only)")
    tier_paths = [t for t in tier_paths if not is_diagnostic(t)]
    for tier in tier_paths:
        art = load(tier)
        if not isinstance(art, dict):
            continue
        name = os.path.basename(tier)
        if art.get("contended") is True:
            bad = True
            print(f"!! {name} is stamped contended=true "
                  f"(attempts={art.get('attempts')}) — re-run it solo")
        if art.get("degraded") is True:
            print(f"?? {name} stamped degraded=true (reps={art.get('reps')}, "
                  f"attempts={art.get('attempts')}) — budget-reduced "
                  f"methodology; numbers are floor-quality")
        if art.get("inverted") is True:
            bad = True
            print(f"!! {name} is stamped inverted=true (structural "
                  f"inversions persisted through every retry, "
                  f"attempts={art.get('attempts')}) — the run is refused; "
                  f"re-run it solo")
        # Steady-weather acceptance (r15): a run may be stamped weather=true
        # with an elevated probe_line when N consecutive settled probes
        # agreed within a tight band above the ledger line — the host was
        # uniformly slow (hypervisor neighbors), not burst-contended. Its
        # numbers are honest-but-slow: adjudicate probes against the
        # STAMPED line, and surface a note instead of failing. A floor
        # above 1.0s is never weather (Bench.WeatherCap refuses it too).
        line = PROBE_MAX
        pl = art.get("probe_line")
        floor = art.get("probe_floor")
        if art.get("weather") is True and isinstance(pl, (int, float)):
            # Derive the acceptable line from the STAMPED probe floor
            # (r16+ artifacts carry it) instead of trusting any
            # self-stamped probe_line up to the cap: the line must equal
            # floor x WEATHER_LINE_MULT (3-decimal artifact rounding) and
            # the floor itself must sit under WEATHER_CAP.
            if isinstance(floor, (int, float)):
                if floor <= WEATHER_CAP and \
                        abs(pl - floor * WEATHER_LINE_MULT) < 5e-3:
                    line = pl
                    print(f"?? {name} stamped weather=true (probe_floor="
                          f"{floor}, line={pl}) — host uniformly slow "
                          f"during the run; timings are comparable "
                          f"within-run, conservative cross-round")
                else:
                    bad = True
                    print(f"!! {name} weather stamp not corroborated: "
                          f"probe_line={pl} but probe_floor={floor} "
                          f"(expected line = floor x {WEATHER_LINE_MULT}, "
                          f"floor <= {WEATHER_CAP}) — refusing the run")
            # legacy pre-floor artifact: the old bounded acceptance
            elif PROBE_MAX < pl <= WEATHER_CAP * WEATHER_LINE_MULT:
                line = pl
                print(f"?? {name} stamped weather=true (probe_line={pl}, "
                      f"no probe_floor: pre-r16 artifact) — host uniformly "
                      f"slow during the run")
        # io_probe quiet-floor ledger stamp (VERDICT r17 #4): non-gating —
        # the stamp is the standing falsifier behind "IO weather" claims.
        # A stamped line must equal floor x IO_LINE_MULT (mirror check, same
        # anti-self-stamping rule as the CPU weather line).
        io = art.get("io_probe") or {}
        if isinstance(io, dict) and isinstance(io.get("line"), (int, float)):
            io_floor = io.get("floor")
            if not (isinstance(io_floor, (int, float)) and
                    abs(io["line"] - io_floor * IO_LINE_MULT) < 5e-3):
                bad = True
                print(f"!! {name} io_probe line={io.get('line')} not "
                      f"corroborated by floor={io_floor} x {IO_LINE_MULT}")
            elif io.get("weather_io") is True:
                print(f"?? {name} stamped weather_io=true (fsync probes "
                      f"{io.get('before')}/{io.get('after')} over ledger "
                      f"line {io.get('line')}) — disk weather; IO-bound "
                      f"gates are honest-but-slow this draw")
        cal = art.get("calibration") or {}
        # The after-probe gets the measured idle-noise drift band (x1.15
        # over before) — a mid-pass co-tenant reads 1.5-2x, never +15%
        # (mirrors Bench.passClean / AfterDriftBand).
        before = cal.get("before")
        after_line = line
        if isinstance(before, (int, float)) and before <= line:
            after_line = max(line, before * AFTER_DRIFT_BAND)
        dirty = {k: v for k, v in cal.items()
                 if isinstance(v, (int, float)) and
                 v > (after_line if k == "after" else line)}
        if dirty:
            bad = True
            print(f"!! {name} calibration probe over {line}s: {dirty} "
                  f"— the run was contended, its numbers are not evidence")

    # 5. Growth exponents from the committed artifacts (r10 VERDICT #1:
    # 'zero super-linear' must be machine-checked, not asserted). Adjacent
    # tier pairs are each one decade of data.
    def qtimes(path):
        art = load(path)
        if isinstance(art, dict) and isinstance(art.get("queries"), dict):
            return art["queries"]
        return None

    def qbytes(path):
        art = load(path)
        if isinstance(art, dict) and isinstance(art.get("bytes"), dict):
            return art["bytes"]
        return {}

    def qforensics(path):
        """(keys, {gate: [[per-rep metrics]]}) — stamped by r18+ artifacts."""
        art = load(path)
        if isinstance(art, dict) and isinstance(art.get("forensics"), dict) \
                and isinstance(art.get("forensics_keys"), list):
            return art["forensics_keys"], art["forensics"]
        return [], {}

    def weather_suspect(keys, reps):
        """The in-artifact weather falsifier (VERDICT r17 #3): across a
        gate's timed reps, input/shuffle/spill bytes are DETERMINISTIC per
        (code, data) — rep-level parity there plus a >=1.5x run/cpu swing
        is the measured-environmental signature (the r17 MinHash forensics:
        cpu_ms itself swung 3.2x between byte-identical reps). Parity
        broken, or both reps uniformly slow (no swing), stays a real flag.
        Returns a reason string when the signature matches, else None."""
        if not keys or not isinstance(reps, list) or len(reps) < 2:
            return None
        idx = {k: i for i, k in enumerate(keys)}

        def col(k):
            i = idx.get(k)
            if i is None:
                return []
            return [r[i] for r in reps if isinstance(r, list) and i < len(r)]

        def parity(vals, tol=1.05):
            if not vals:
                return True
            lo, hi = min(vals), max(vals)
            if hi == 0:
                return True
            return lo > 0 and hi / lo <= tol

        def swing(vals, bar=1.5):
            pos = [v for v in vals if v > 0]
            return len(pos) >= 2 and max(pos) / min(pos) >= bar

        bytes_par = parity(col("input_bytes")) and \
            parity(col("shuffle_bytes_written"))
        spill_par = parity(col("disk_spill_bytes")) and \
            parity(col("mem_spill_bytes"))
        time_swing = swing(col("run_ms")) or swing(col("cpu_ms"))
        if bytes_par and spill_par and time_swing:
            return ("rep-level byte+spill parity with >=1.5x run/cpu swing "
                    "— measured-environmental signature")
        return None
    def scale_of(path):
        # replication factor stamped by BenchScale, e.g. "1000x-/root/..."
        art = load(path)
        if isinstance(art, dict):
            m = re.match(r"(\d+)x-", str(art.get("scale") or ""))
            if m:
                return float(m.group(1))
        return None

    pairs = []
    lo01 = f"{ROOT}/BENCH_r{cur:02d}_builder_sf01.json"
    sf1 = f"{ROOT}/BENCH_r{cur:02d}_sf1.json"
    if os.path.exists(lo01) and os.path.exists(sf1):
        pairs.append((lo01, sf1, 10.0))
    for hi in sorted(glob.glob(f"{ROOT}/BENCH_r{cur:02d}_sf10*.json")):
        if is_diagnostic(hi):
            continue
        if os.path.exists(sf1):
            # the DATA ratio between the two tiers, not a hardcoded decade:
            # sf1 (10x) -> sf10* (100x) is 10x, but sf1 -> sf100 (1000x) is
            # a 100x step — judging the latter against a 10x allowance
            # would flag every healthy linear gate as super-linear
            hs, ls = scale_of(hi), scale_of(sf1)
            ratio = (hs / ls) if (hs and ls and hs > ls) else 10.0
            pairs.append((sf1, hi, ratio))
    for lo_path, hi_path, ratio in pairs:
        lo, hi = qtimes(lo_path), qtimes(hi_path)
        if lo is None or hi is None:
            continue
        # Per-query byte accounting (r11 VERDICT #7): when BOTH artifacts
        # carry task-level bytes-read for a query, the growth bar for that
        # query is (actual byte ratio)^1.2 instead of the nominal tier
        # ratio — data-shape skew in the synthesized tiers (e.g. replicas
        # carrying disproportionate binary payload) is then adjudicated
        # from the artifacts themselves, not narrated. Artifacts predating
        # the bytes field fall back to the nominal ratio unchanged.
        lo_b, hi_b = qbytes(lo_path), qbytes(hi_path)
        hi_fk, hi_fx = qforensics(hi_path)
        allowed = ratio ** 1.2
        # Byte-derived allowance is CAPPED at ratio * BYTE_SKEW_CAP before
        # the exponent: task-level bytesRead scales with how many corpus
        # scans the plan performs, not only with the tier's data shape — an
        # uncapped allowance would let a plan whose scan count grows with
        # data (trainer-round-style loops) license its own extra scans and
        # defeat the super-linear gate for exactly that regression class.
        # The cap admits data-shape skew (e.g. binary payload replicating
        # disproportionately: mm_decode_real measured 1.54x skew) up to 2x
        # over nominal, and nothing a scan-count blow-up needs.
        BYTE_SKEW_CAP = 2.0
        over = []
        worst = (0.0, None)
        n_bytes_adjudicated = 0
        for q in hi:
            if q in lo and lo[q] > 0 and hi[q] > 0:
                g = hi[q] / lo[q]
                if g > worst[0]:
                    worst = (g, q)
                allowed_q, bnote = allowed, ""
                if lo_b.get(q, 0) > 0 and hi_b.get(q, 0) > 0:
                    bratio = hi_b[q] / lo_b[q]
                    # never BELOW the nominal bar: a query reading a fixed
                    # byte count (bounded probe sets) must not fail on noise
                    allowed_q = max(min(bratio, ratio * BYTE_SKEW_CAP),
                                    ratio) ** 1.2
                    bnote = f", read {bratio:.1f}x bytes"
                    n_bytes_adjudicated += 1
                # hi > 1s: sub-second fixed-cost queries flip past the
                # ratio on pure min-of-N noise without being a plan problem
                if g > allowed_q and hi[q] > 1.0:
                    over.append((g, q, lo[q], hi[q], allowed_q, bnote))
        tag = f"{os.path.basename(lo_path)} -> {os.path.basename(hi_path)}"
        if over:
            for g, q, l, h, a, bn in sorted(over, reverse=True):
                # In-artifact adjudication (VERDICT r17 #3): a flagged gate
                # whose hi-tier forensics show the weather signature is
                # surfaced as weather-suspect (re-draw it solo) instead of
                # failing the round — the falsifier is the stamped rep-level
                # byte/spill parity, not a narrative.
                ws = weather_suspect(hi_fk, hi_fx.get(q))
                if ws:
                    print(f"?? SUPER-LINEAR-BUT-WEATHER-SUSPECT {tag}: {q} "
                          f"grew {g:.1f}x on {ratio:.0f}x data "
                          f"({l:.2f}s -> {h:.2f}s, allowed {a:.1f}x{bn}); "
                          f"forensics: {ws} — re-draw the tier solo")
                else:
                    bad = True
                    print(f"!! SUPER-LINEAR {tag}: {q} grew {g:.1f}x on "
                          f"{ratio:.0f}x data ({l:.2f}s -> {h:.2f}s, allowed "
                          f"{a:.1f}x{bn})")
        else:
            w = f", worst {worst[0]:.1f}x ({worst[1]})" if worst[1] else ""
            b = (f", {n_bytes_adjudicated} byte-adjudicated"
                 if n_bytes_adjudicated else "")
            print(f"   growth {tag}: all under the bar{w}{b}")

    print("RESULT:", "ATTENTION NEEDED" if bad else "clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
