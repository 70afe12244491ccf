#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule (BASELINE.json:14).

Runs the SAME bench workload on the SAME input at two cluster sizes and
reports throughput at both plus

    efficiency = throughput(4N) / (4 x throughput(N))

Two topologies (SPARK_SCALE_MODE):

``cluster`` (default)
    ``local-cluster[N/4, 4, mem]`` vs ``local-cluster[4N/4, 4, mem]`` —
    SEPARATE EXECUTOR JVMs (standalone master + workers forking
    CoarseGrainedExecutorBackend processes). This matches the production
    "N vs 4N executors via spark-submit" framing and sidesteps the host's
    single-JVM thread ceiling documented in BENCH/BASELINE.md.

``threads``
    ``local[N]`` vs ``local[4N]`` — one JVM, thread-level parallelism
    (kept for comparison against the round-1 numbers).

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
MODE = os.environ.get("SPARK_SCALE_MODE", "cluster")
CORES_PER_EXEC = int(os.environ.get("SPARK_SCALE_EXEC_CORES", "4"))
EXEC_MEM_MB = int(os.environ.get("SPARK_SCALE_EXEC_MEM_MB", "4096"))


def _master(cpus: int) -> str | None:
    if MODE == "threads":
        return None  # bench.py defaults to local[cpus]
    n_exec = max(cpus // CORES_PER_EXEC, 1)
    return f"local-cluster[{n_exec},{CORES_PER_EXEC},{EXEC_MEM_MB}]"


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    master = _master(cpus)
    if master:
        env["SPARK_GRAFT_MASTER"] = master
        env.setdefault("SPARK_EXECUTOR_MEM", f"{EXEC_MEM_MB - 512}m")
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
        f"## Scaling run {stamp} — {_master(N_SMALL) or f'local[{N_SMALL}]'} vs "
        f"{_master(N_BIG) or f'local[{N_BIG}]'} "
        f"({'separate executor JVMs — the N vs ' + str(int(ratio)) + 'N production framing' if MODE != 'threads' else 'single-JVM thread proxy'})",
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
