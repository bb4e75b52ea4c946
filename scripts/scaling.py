"""Scaling-efficiency evidence (north_rule): run the identical bench job on
identical input at two parallelism levels (local[8] vs local[32]) and report
throughput at both plus scaling efficiency.

Efficiency definition (4x cores): eff = (T_8 / T_32) / 4 — 1.0 means
perfect linear scaling, >=0.8 satisfies the north rule.

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
LEVELS = [8, 32]


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench at {cpus} cpus produced no JSON:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    results = {c: run_bench(c) for c in LEVELS}
    lo, hi = LEVELS
    summary = {"levels": results}
    per_q = {}
    for q in results[lo]["queries"]:
        t_lo = results[lo]["queries"][q]
        t_hi = results[hi]["queries"][q]
        per_q[q] = round((t_lo / t_hi) / (hi / lo), 3)
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    summary["efficiency_total"] = round((t_lo / t_hi) / (hi / lo), 3)
    summary["efficiency_per_query"] = per_q
    summary["speedup_total"] = round(t_lo / t_hi, 2)

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured engine numbers",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by scripts/scaling.py.",
        "Identical job, identical input, two parallelism levels "
        f"(local[{lo}] vs local[{hi}]) — the sandbox evidence for the "
        "north-rule two-cluster-size scaling criterion.",
        "",
        "| query | local[8] sec | local[32] sec | speedup | scaling efficiency (4x cores) |",
        "|---|---|---|---|---|",
    ]
    for q in results[lo]["queries"]:
        a = results[lo]["queries"][q]
        b = results[hi]["queries"][q]
        lines.append(f"| {q} | {a:.2f} | {b:.2f} | {a / b:.2f}x | {per_q[q]:.3f} |")
    lines += [
        f"| **total** | {t_lo:.2f} | {t_hi:.2f} | {t_lo / t_hi:.2f}x | "
        f"{summary['efficiency_total']:.3f} |",
        "",
        f"Reverse-geocode throughput: {results[lo]['points_per_sec']:,.0f} pts/s "
        f"at 8 cores, {results[hi]['points_per_sec']:,.0f} pts/s at 32 cores "
        "(reference single-process baseline: ~3,333 pts/s, README.md:161).",
        f"Document pipeline throughput: {results[lo]['docs_per_sec']:,.0f} docs/s "
        f"at 8 cores, {results[hi]['docs_per_sec']:,.0f} docs/s at 32 cores.",
        "",
        "Caveats: local-mode scaling includes fixed driver/JVM overheads that a",
        "real 4x-executor cluster would not share; per-query efficiency is the",
        "honest per-operator number, total efficiency includes amortized session",
        "overhead common to both runs.",
    ]
    (bench_dir / "BASELINE.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
