#!/usr/bin/env python3
"""Regenerate Bench.pinMedianSec from a BASELINE re-pin triple (dev tool
only — the shipped library is pure Scala/Spark; this script exists so the
stall-retry reference map is produced by one command instead of ad-hoc
snippets that can drift from the rule in BASELINE.md).

Usage: python3 tools/regen_pin.py <run1.out> <run2.out> [<run3.out> ...]

Each argument is a file containing graft.Bench's stdout (or just its JSON
line). The tool locates the `{"metric":"total",...}` line in each, takes
the per-query MEDIAN across the runs (the BASELINE stall-retry rule), and
prints:
  - the headline medians (steady-state total, prebuild, sum-of-medians),
  - the 12 slowest per-query medians (for the BASELINE.md tail note),
  - the exact `pinMedianSec` Scala literal to paste into Bench.scala.
Queries missing from any run (e.g. budget-skipped) are flagged and their
median is taken over the runs that HAVE them; zero times (crashed queries)
are excluded from the median the same way.
"""
import json
import statistics
import sys


def load_bench_line(path):
    """Merge every bench JSON line in the file. Since round 11 Bench emits
    TWO lines — a `total_detail` line carrying the per-query map and a
    compact `total` summary carrying prebuild_sec + health lists (see
    Bench.scala) — so the per-run record is their union; single-line
    pre-round-11 outputs parse identically.
    """
    merged = {}
    seen = {"total": 0, "total_detail": 0}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not (line.startswith('{') and '"metric"' in line):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                # a truncated BENCH line is a real input problem — fail loud;
                # other malformed metric-ish lines (log noise) are skipped
                if '"metric":"total' in line:
                    raise SystemExit(f"{path}: truncated bench JSON line")
                continue
            # merge ONLY the two Bench lines — a file that also carries
            # ScaleBench/other metric JSON must not pollute the pin
            kind = d.get("metric")
            if kind in seen:
                seen[kind] += 1
                # a file holding TWO appended bench runs would silently mix
                # run 1's queries map with run 2's summary — one run per
                # file is the contract, so fail loudly instead
                if seen[kind] > 1:
                    raise SystemExit(
                        f"{path}: {seen[kind]} '{kind}' bench lines found — "
                        "one run per file; split appended runs into "
                        "separate files")
                merged.update(d)
    if "queries" not in merged:
        raise SystemExit(f"{path}: no bench JSON line with a queries map found")
    return merged


def main(argv):
    if len(argv) < 2:
        raise SystemExit(__doc__)
    runs = [load_bench_line(p) for p in argv[1:]]

    names = sorted({n for r in runs for n in r["queries"]})
    medians, partial = {}, []
    for n in names:
        samples = [r["queries"][n] for r in runs
                   if n in r["queries"] and r["queries"][n] > 0]
        if not samples:
            partial.append(f"{n}: NO valid samples (crashed/skipped in every run)")
            continue
        if len(samples) < len(runs):
            partial.append(f"{n}: median over {len(samples)}/{len(runs)} runs")
        medians[n] = statistics.median(samples)

    totals = [r["value"] for r in runs]
    prebuilds = [r.get("prebuild_sec", 0.0) for r in runs]
    print(f"runs: {len(runs)}  queries: {len(medians)}")
    print(f"steady-state totals: {['%.2f' % t for t in totals]}"
          f"  median {statistics.median(totals):.2f}")
    print(f"prebuild totals:     {['%.2f' % p for p in prebuilds]}"
          f"  median {statistics.median(prebuilds):.2f}")
    print(f"sum of per-query medians: {sum(medians.values()):.1f}")
    for w in partial:
        print(f"WARNING {w}")
    tail = sorted(medians.items(), key=lambda kv: -kv[1])[:12]
    print("slowest medians: " + ", ".join(f"{n} {v:.2f}" for n, v in tail))

    # the Scala literal, 6 entries per line to match Bench.scala's layout
    entries = [f'"{n}" -> {round(medians[n], 3)}' for n in sorted(medians)]
    lines = []
    for i in range(0, len(entries), 6):
        lines.append("    " + ", ".join(entries[i:i + 6]))
    # private[graft], not private: Round12Spec reads the map for its
    # pin-completeness assertion — emitting object-private would break the
    # test compile on the next by-the-book re-pin paste
    print("\n  private[graft] val pinMedianSec: Map[String, Double] = Map(")
    print(",\n".join(lines) + ")")


if __name__ == "__main__":
    main(sys.argv)
