#!/usr/bin/env python3
"""Analyze bench_loop.sh output: flag per-query anomalies (> FACTOR x
cross-run median) and, for each, summarize the -XX:+PrintCompilation
activity inside the query's [t0_ms, t1_ms] uptime window — compile counts
by tier, deopts (made not entrant / made zombie), and the biggest methods
compiled. Usage: tools/hunt_analyze.py <prefix> [factor]"""
import json, sys, glob, re, statistics as st

prefix = sys.argv[1]
factor = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
runs = {}
for f in sorted(glob.glob(prefix + "_run*.json")):
    try:
        with open(f) as fh:
            line = fh.read().strip()
        if line:
            runs[f] = json.loads(line)
    except Exception as e:
        print(f"skip {f}: {e}")

if not runs:
    sys.exit("no runs parsed")

names = sorted({q for r in runs.values() for q in r["queries"]})
med = {q: st.median([r["queries"][q] for r in runs.values() if q in r["queries"]])
       for q in names}
print(f"{len(runs)} runs; totals:",
      [round(r["value"], 1) for r in runs.values()])
print(f"suite median-of-medians total: {round(sum(med.values()),1)}s")

anoms = []
for f, r in runs.items():
    for q, sec in r["queries"].items():
        if sec > factor * med[q] and sec > 2.0:
            anoms.append((f, q, sec, med[q], r.get("jvm_stats", {}).get(q)))

if not anoms:
    print(f"NO anomalies (> {factor}x median and > 2s) across all runs")
for f, q, sec, m, stats in anoms:
    print(f"\n=== ANOMALY {q} in {f}: {sec:.1f}s (median {m:.1f}s)")
    print(f"    stats: {json.dumps(stats)}")
    if not stats:
        continue
    t0, t1 = stats["t0_ms"], stats["t1_ms"]
    jit = f.replace(".json", ".jit")
    comp = re.compile(r"^\s*(\d+)\s+(\d+)\s+(.*)$")
    n_comp = {}
    deopt = 0
    big = []
    skipped = []
    try:
        with open(jit) as fh:
            for line in fh:
                mm = comp.match(line)
                if not mm:
                    continue
                ts = int(mm.group(1))
                if not (t0 <= ts <= t1):
                    continue
                rest = mm.group(3)
                if "made not entrant" in rest or "made zombie" in rest:
                    deopt += 1
                    continue
                if "COMPILE SKIPPED" in rest:
                    skipped.append(rest[:120])
                    continue
                tier = re.match(r"[%!sbn ]*(\d)\s", rest)
                t = tier.group(1) if tier else "?"
                n_comp[t] = n_comp.get(t, 0) + 1
                sz = re.search(r"\((\d+) bytes\)", rest)
                if sz:
                    big.append((int(sz.group(1)), rest[:140]))
    except FileNotFoundError:
        print("    (no .jit log)")
        continue
    print(f"    window {t0}->{t1}ms: compiles by tier {n_comp}, "
          f"deopt events {deopt}, skipped {len(skipped)}")
    for sz, line in sorted(big, reverse=True)[:8]:
        print(f"      {sz:7d}B {line}")
    for s in skipped[:5]:
        print(f"      SKIP {s}")
