#!/usr/bin/env python3
"""Mechanical pin-regression comparison between two Bench runs.

Encodes BASELINE.md's reading rules so no human judgment is involved:

  1. CALIBRATION NORMALIZATION — CONDITIONAL, exactly as BASELINE.md
     states it: machine interference inflates the probe AND the query
     totals TOGETHER (r7: both ~1.3x), so the probe ratio is applied
     only when it AGREES with the common-set total ratio (within 25%)
     and both point the same way (>15% shift). A probe ratio that
     diverges from the total ratio is probe noise (the CPU sentinel has
     ~2x run-to-run variance on a quiet machine), and times are
     compared RAW — normalizing unconditionally would manufacture
     phantom regressions from a fast-probe run.
  2. BURST EXCLUSION: queries listed in either run's `burst_flagged`
     (bracketing probes > 2× the run-median probe in a majority of
     passes — computed by graft.Bench itself) are excluded from the
     regression verdict and reported separately.
  3. SPLICE PROVENANCE: queries listed in either run's
     `spliced_queries` (medians merged in from a dedicated clean
     subset run rather than measured in the main passes — always
     disclosed alongside in `spliced_note`/BASELINE.md) are still
     compared, but carry a `spliced` flag in the JSON artifact and a
     [spliced] tag in the text output, so a reader sees the
     provenance without cross-referencing prose.

Usage:
    python3 tools/pin_compare.py PIN_BENCH_FULL.json NEW_BENCH_FULL.json \
        [--threshold 1.5] [--json PIN_COMPARE.json]

With --json the compare writes its ENTIRE input and verdict — both
runs' calibration probe sets, the probe/total ratios, the
agree/disagree decision, the applied normalization factor, every
per-query (pin, new, normalized) triple, and the burst exclusions —
so the round's headline claim is re-derivable arithmetically from one
committed artifact instead of citing numbers a reader cannot trace.

Exit 1 if any non-excluded query regresses beyond threshold× the
normalized pin time (+0.2 s floor so micro-queries can't trip on
noise); prints improvements and the normalization factors either way.

Dev-only tool (driver-side python); the engine itself is pure
Scala/Spark.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pin")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--json", default=None,
                    help="write the full compare (inputs + verdict) here")
    args = ap.parse_args()

    pin, new = load(args.pin), load(args.new)
    cal_pin = statistics.median(pin.get("calibration", [1.0]))
    cal_new = statistics.median(new.get("calibration", [1.0]))
    excluded = set(pin.get("burst_flagged", [])) | set(
        new.get("burst_flagged", []))
    spliced = {n: [src for src, run in (("pin", pin), ("new", new))
                   if n in set(run.get("spliced_queries", []))]
               for run_ in (pin, new)
               for n in run_.get("spliced_queries", [])}

    pq, nq = pin.get("queries", {}), new.get("queries", {})
    common = sorted(set(pq) & set(nq))
    infl_probe = cal_new / cal_pin if cal_pin > 0 else 1.0
    tot_pin = sum(pq[n] for n in common) or 1.0
    tot_new = sum(nq[n] for n in common)
    infl_total = tot_new / tot_pin
    same_dir = (infl_probe > 1.15 and infl_total > 1.15) or \
        (infl_probe < 0.87 and infl_total < 0.87)
    agree = abs(infl_probe - infl_total) <= 0.25 * max(infl_probe, 1e-9)
    norm = (1.0 / infl_probe) if (same_dir and agree) else 1.0
    regressions, improvements, skipped = [], [], []
    for name in common:
        if name in excluded:
            skipped.append(name)
            continue
        comparable = nq[name] * norm
        if comparable > args.threshold * pq[name] + 0.2:
            regressions.append((name, pq[name], nq[name], comparable))
        elif comparable < pq[name] / args.threshold - 0.2:
            improvements.append((name, pq[name], nq[name], comparable))

    print(f"pin calibration median {cal_pin:.3f}s, run {cal_new:.3f}s "
          f"(probe ratio x{infl_probe:.3f}, total ratio x{infl_total:.3f})"
          f" -> normalization x{norm:.3f}"
          + ("" if norm != 1.0 else " (raw compare: probe and total "
             "ratios disagree or no uniform shift)"))
    print(f"{len(common)} common queries; "
          f"{len(set(nq) - set(pq))} new, {len(set(pq) - set(nq))} gone; "
          f"{len(skipped)} burst-excluded: {sorted(skipped)}")
    if spliced:
        print(f"{len(spliced)} spliced (subset-run medians, disclosed): "
              + ", ".join(f"{n}[{'+'.join(srcs)}]"
                          for n, srcs in sorted(spliced.items())))

    def tag(name):
        return " [spliced]" if name in spliced else ""
    for name, p, n, c in sorted(improvements, key=lambda t: t[3] - t[1]):
        print(f"FASTER {name}{tag(name)}: pin {p:.3f}s -> {n:.3f}s "
              f"(normalized {c:.3f}s)")
    for name, p, n, c in sorted(regressions, key=lambda t: t[1] - t[3]):
        print(f"REGRESSION {name}{tag(name)}: pin {p:.3f}s -> {n:.3f}s "
              f"(normalized {c:.3f}s > {args.threshold}x + 0.2s)")
    total_pin = sum(pq[n] for n in common)
    total_new = sum(nq[n] for n in common) * norm
    print(f"common-set total: pin {total_pin:.1f}s, "
          f"normalized run {total_new:.1f}s (x{total_new / total_pin:.3f})")
    if args.json:
        artifact = {
            "pin_file": args.pin,
            "new_file": args.new,
            "threshold": args.threshold,
            "pin_calibration": pin.get("calibration", []),
            "new_calibration": new.get("calibration", []),
            "cal_pin_median": cal_pin,
            "cal_new_median": cal_new,
            "probe_ratio": infl_probe,
            "total_ratio": infl_total,
            "same_direction": same_dir,
            "agree_within_25pct": agree,
            "normalization_applied": norm,
            "burst_excluded": sorted(skipped),
            "n_common": len(common),
            "new_queries": sorted(set(nq) - set(pq)),
            "gone_queries": sorted(set(pq) - set(nq)),
            "spliced": {n: srcs for n, srcs in sorted(spliced.items())},
            "per_query": {
                name: dict(
                    {"pin_s": pq[name], "new_s": nq[name],
                     "normalized_s": round(nq[name] * norm, 4)},
                    **({"spliced": spliced[name]}
                       if name in spliced else {}))
                for name in common},
            "regressions": [
                {"query": n0, "pin_s": p0, "new_s": n1,
                 "normalized_s": round(c0, 4)}
                for n0, p0, n1, c0 in regressions],
            "improvements": [
                {"query": n0, "pin_s": p0, "new_s": n1,
                 "normalized_s": round(c0, 4)}
                for n0, p0, n1, c0 in improvements],
            "common_total_pin_s": round(total_pin, 3),
            "common_total_normalized_s": round(total_new, 3),
            "common_total_ratio": round(total_new / total_pin, 4),
        }
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    if regressions:
        print(f"{len(regressions)} regressions")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
