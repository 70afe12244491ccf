#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule (BASELINE.json:14).

Runs the SAME bench workload on the SAME input at two parallelism levels —
``local[8]`` vs ``local[32]`` (the sandbox proxy for N vs 4N executors per
driver instruction) — in separate JVMs, then reports throughput at both and

    efficiency = throughput(4N) / (4 x throughput(N))

Appends the results table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
N_SMALL = int(os.environ.get("SPARK_SCALE_N", "8"))
N_BIG = int(os.environ.get("SPARK_SCALE_4N", "32"))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_BENCH_DOCS", "100000")
    env.setdefault("SPARK_GRAFT_REPS", "1")
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _min_merge(runs: list[dict]) -> dict:
    """Per-query min across alternating repetitions (cancels host drift —
    this sandbox varies 2-3x run-to-run, see BENCH/BASELINE.md)."""
    best = json.loads(json.dumps(runs[0]))
    for r in runs[1:]:
        for q, t in r["queries"].items():
            if t < best["queries"][q]:
                best["queries"][q] = t
    for r in runs:
        kt = r["aux"]["kg_triples_per_sec"]
        dt = r["aux"]["dm_triples_per_sec"]
        best["aux"]["kg_triples_per_sec"] = max(best["aux"]["kg_triples_per_sec"], kt)
        best["aux"]["dm_triples_per_sec"] = max(best["aux"]["dm_triples_per_sec"], dt)
    return best


def main() -> None:
    rounds = int(os.environ.get("SPARK_SCALE_ROUNDS", "3"))
    small_runs, big_runs = [], []
    for _ in range(rounds):  # A,B,A,B,... cancels cache/thermal drift
        small_runs.append(run_bench(N_SMALL))
        big_runs.append(run_bench(N_BIG))
    small = _min_merge(small_runs)
    big = _min_merge(big_runs)
    ratio = N_BIG / N_SMALL

    rows = []
    effs = []
    for name in small["queries"]:
        t_s, t_b = small["queries"][name], big["queries"][name]
        sp = t_s / t_b if t_b else 0.0
        eff = sp / ratio
        effs.append((name, eff))
        rows.append((name, t_s, t_b, round(sp, 2), round(eff, 3)))

    kg_tps_s = small["aux"]["kg_triples_per_sec"]
    kg_tps_b = big["aux"]["kg_triples_per_sec"]
    kg_eff = kg_tps_b / (ratio * kg_tps_s) if kg_tps_s else 0.0

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    lines = [
        "",
        f"## Scaling run {stamp} — local[{N_SMALL}] vs local[{N_BIG}] "
        f"(sandbox proxy for N vs {int(ratio)}N executors)",
        "",
        f"Same workload, same input (`{os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')}`, "
        f"{small['aux']['bench_docs']} synth docs). "
        f"KG-pipeline throughput: **{kg_tps_s:,} triples/s @ {N_SMALL} cores -> "
        f"{kg_tps_b:,} triples/s @ {N_BIG} cores**, scaling efficiency "
        f"**{kg_eff:.3f}** (target >= 0.8 x ideal-fraction; 1.0 = perfectly linear).",
        "",
        f"| query | t({N_SMALL}c) s | t({N_BIG}c) s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for name, t_s, t_b, sp, eff in rows:
        lines.append(f"| {name} | {t_s} | {t_b} | {sp} | {eff} |")
    lines.append("")
    lines.append(f"raw small: `{json.dumps(small)}`")
    lines.append(f"raw big:   `{json.dumps(big)}`")
    lines.append("")

    out_path = ROOT / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    existing = out_path.read_text() if out_path.exists() else "# BENCH baselines\n"
    out_path.write_text(existing + "\n".join(lines))
    print(json.dumps({"kg_eff": round(kg_eff, 3), "rows": rows}))


if __name__ == "__main__":
    main()
