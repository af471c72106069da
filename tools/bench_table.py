#!/usr/bin/env python3
"""Merge an in-suite Bench run (sbt log with the JSON metric line) with a
standalone rep2 sweep (tools/qbench_all.sh output) into BENCH_r05_table.md.

Usage: bench_table.py <sbt_bench_log>... --sweep <rep2_sweep_log> [-o out.md]

The in-suite column is the LAST metric line of each log (one column per
log); the ratio column is in-suite / rep2 for the last log. Queries with
fixture or training cost folded into their bench number are footnoted.
"""
import argparse, json, re, sys

FOOTNOTES = {
    # Names starting with "_" are bench PSEUDO-ROWS, not registry queries:
    # real suite work timed separately (counted in the suite total, not in
    # n_queries). Don't join them against SparkEntry.queries.
    "_graph_cache_build": "bench pseudo-row: shared-adjacency cache build, "
                          "not a registry query",
    "ann_ivf_topk": "includes 3 k-means training iterations",
    "bucketed_join": "includes writing the bucketed layout to a tmp dir",
    "dolar_e2e_interval": "includes raw-zone fixture materialization",
    "dolar_parity": "includes raw-zone fixture materialization",
}

def load_metric(path):
    last = None
    for line in open(path):
        if '"metric"' in line:
            last = line[line.index('{'):]
    if last is None:
        sys.exit(f"no metric line in {path}")
    return json.loads(last)

def load_sweep(path):
    rep2 = {}
    for line in open(path):
        m = re.match(r"\[qbench\] (\S+) rep2 ([\d.]+)s", line)
        if m:
            rep2[m.group(1)] = float(m.group(2))
    return rep2

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--sweep", required=True)
    ap.add_argument("-o", "--out", default="BENCH_r05_table.md")
    a = ap.parse_args()

    runs = [load_metric(p) for p in a.logs]
    rep2 = load_sweep(a.sweep)
    names = sorted(set().union(*[r["queries"] for r in runs], rep2))

    cols = " | ".join(f"in-suite run{i+1} (s)" for i in range(len(runs)))
    lines = [
        "# BENCH r5 — per-query: in-suite (driver harness, sbt) vs standalone rep2",
        "",
        f"In-suite columns are full `sbt \"runMain graft.Bench\"` runs at sf0.1"
        f" (driver-identical); rep2 is `graft.QBench <name> 2` in a fresh JVM"
        f" per query (steady state). Ratio = last in-suite run / rep2.",
        "",
        f"| query | {cols} | rep2 (s) | ratio | note |",
        f"|---|{'---|' * len(runs)}---|---|---|",
    ]
    worst = []
    for n in names:
        vals = [r["queries"].get(n) for r in runs]
        r2 = rep2.get(n)
        cells = " | ".join("-" if v is None else f"{v:.2f}" for v in vals)
        last = next((v for v in reversed(vals) if v is not None), None)
        ratio = f"{last / r2:.1f}x" if last and r2 else "-"
        if last and r2:
            worst.append((last / r2, n))
        lines.append(f"| {n} | {cells} | {r2 if r2 else '-'} | {ratio} | {FOOTNOTES.get(n, '')} |")
    for i, r in enumerate(runs):
        tm = r.get("t_main_ms")
        lines.append("")
        lines.append(
            f"run{i+1}: total **{r['value']:.1f} s** / {len(r['queries'])} queries, "
            f"failed={r.get('failed', [])}, t_main_ms={tm} "
            f"(JVM+pretouch+session+warmup, outside query timings).")
    worst.sort(reverse=True)
    lines.append("")
    lines.append("Worst in-suite/rep2 ratios (last run): " +
                 ", ".join(f"{n} {v:.1f}x" for v, n in worst[:5]) + ".")
    open(a.out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {a.out}: {len(names)} queries")

if __name__ == "__main__":
    main()
