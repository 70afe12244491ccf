#!/usr/bin/env python
"""Distributed connected-components scaling evidence (VERDICT r3 next-round
#5): every headline scaling run so far took the driver fast path, so the
ITERATIVE CC — the path that matters whenever the entity graph isn't tiny —
had correctness tests but no scaling numbers.

Runs ``connected_components(driver_threshold=0)`` on a deterministic ~10M-edge
graph at two multi-executor-JVM topologies,

    local-cluster[1, C, M]   (N  = 1 executor)
    local-cluster[4, C, M]   (4N = 4 executors)

interleaved A,B,A,B per round (the round-4 standard protocol: alternation
cancels cache/thermal drift), min wall per side, and reports throughput at
both, the scaling efficiency, and the per-iteration shuffle profile the
``stats`` hook captures. Appends a markdown block to BENCH/BASELINE.md.

Graph shape: blocks of 100 consecutive ids; 90% of blocks are STARS (every
node joined to the block head — the shallow alias-cluster shape the KG
pipeline produces) and 10% are CHAINS (node i -> i-1: depth-100 paths that
make pointer doubling earn its keep; plain propagation would need 100
iterations, doubling needs ~log2(100) ~ 7). Expected result is closed-form
(every node's component == its block head), so each measurement is also a
10M-edge correctness check.

Child mode (one fresh JVM per measurement):
    python bench_cc_scaling.py --child <master> <cores>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

N_IDS = int(os.environ.get("SPARK_SCALE_CC_IDS", "10_000_000"))
BLOCK = 100
EXEC_CORES = int(os.environ.get("SPARK_SCALE_EXEC_CORES", "4"))
EXEC_MEM_MB = int(os.environ.get("SPARK_SCALE_EXEC_MEM_MB", "4096"))
ROUNDS = int(os.environ.get("SPARK_SCALE_ROUNDS", "3"))
EDGES_DIR = os.environ.get("SPARK_SCALE_CC_DIR") or f"/tmp/spark_graft_cc_edges_{N_IDS}"

SMALL = f"local-cluster[1,{EXEC_CORES},{EXEC_MEM_MB}]"
BIG = f"local-cluster[4,{EXEC_CORES},{EXEC_MEM_MB}]"


def _edges_expr(spark):
    """Deterministic edge list: id 1..N, block head = floor((id-1)/B)*B + 1;
    chain blocks (block_id % 10 == 0) link i -> i-1, star blocks i -> head."""
    from pyspark.sql import functions as F

    df = spark.range(1, N_IDS + 1)
    block = ((F.col("id") - 1) / BLOCK).cast("long")
    posn = (F.col("id") - 1) % BLOCK
    head = block * BLOCK + 1
    return (
        df.where(posn > 0)  # block heads have no outgoing edge
        .select(
            F.col("id").alias("src"),
            F.when(block % 10 == 0, F.col("id") - 1).otherwise(head).alias("dst"),
        )
    )


def _ensure_edges() -> None:
    if os.path.exists(os.path.join(EDGES_DIR, "_SUCCESS")):
        return
    from p5_rdf_rdb2rdf_spark.session import get_spark

    spark = get_spark("cc-edges-synth", cores=32, shuffle_partitions=32)
    _edges_expr(spark).repartition(64).write.mode("overwrite").parquet(EDGES_DIR)
    spark.stop()


def child(master: str, cores: int) -> None:
    os.environ["SPARK_GRAFT_MASTER"] = master
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    os.environ.setdefault("SPARK_EXECUTOR_MEM", f"{EXEC_MEM_MB - 512}m")
    from pyspark.sql import functions as F

    from p5_rdf_rdb2rdf_spark.pipeline.cc import connected_components
    from p5_rdf_rdb2rdf_spark.session import get_spark

    spark = get_spark(
        "scale-cc", cores=cores,
        shuffle_partitions=int(os.environ.get("SPARK_SCALE_SHUFFLE", "64")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    edges = spark.read.parquet(EDGES_DIR)
    n_edges = edges.count()  # warm the scan outside the timed window
    stats: dict = {}
    kw = {}
    # A/B knob: SPARK_SCALE_CC_SLIM=<rows> pins slim_doubling_frontier_rows
    # (0 = plain shuffle-join doubling always); unset = library default
    if os.environ.get("SPARK_SCALE_CC_SLIM") is not None:
        kw["slim_doubling_frontier_rows"] = int(os.environ["SPARK_SCALE_CC_SLIM"])
    t0 = time.time()
    cc = connected_components(edges, driver_threshold=0, stats=stats, **kw)
    n_nodes = cc.count()
    wall = time.time() - t0
    # closed-form correctness: every node's component is its block head
    bad = cc.where(
        F.col("component") != ((F.col("node") - 1) / BLOCK).cast("long") * BLOCK + 1
    ).count()
    print(json.dumps({
        "master": master, "wall": round(wall, 1), "n_edges": n_edges,
        "n_nodes": n_nodes, "bad_labels": bad, "stats": stats,
    }))
    spark.stop()


def run_child(master: str, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench_cc_scaling.py"),
         "--child", master, str(cores)],
        capture_output=True, text=True, timeout=3600,
        env=dict(os.environ),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    if r["bad_labels"]:
        raise RuntimeError(f"CC produced {r['bad_labels']} wrong labels: {r}")
    return r


def main() -> None:
    _ensure_edges()
    results: dict[str, list[dict]] = {SMALL: [], BIG: []}
    for i in range(ROUNDS):
        for master, cores in ((SMALL, EXEC_CORES), (BIG, EXEC_CORES * 4)):
            r = run_child(master, cores)
            results[master].append(r)
            print(f"  round {i + 1} cc @ {master}: {r['wall']}s "
                  f"({r['stats'].get('iterations')} iters)", file=sys.stderr)

    small = min(results[SMALL], key=lambda r: r["wall"])
    big = min(results[BIG], key=lambda r: r["wall"])
    tps_s, tps_b = small["n_edges"] / small["wall"], big["n_edges"] / big["wall"]
    eff = tps_b / (4 * tps_s)

    lines = [
        "",
        f"## Distributed-CC scaling run {time.strftime('%Y-%m-%d %H:%M:%S')} "
        f"— {SMALL} vs {BIG} (separate executor JVMs; interleaved A/B pairs, "
        f"min of {ROUNDS})",
        "",
        f"**Iterative connected components** ({small['n_edges']:,} edges, "
        f"{small['n_nodes']:,} nodes, driver_threshold=0, 90% star / 10% "
        f"chain-100 blocks, closed-form-verified): "
        f"{small['wall']}s @ 1 exec ({tps_s:,.0f} edges/s) -> "
        f"{big['wall']}s @ 4 exec ({tps_b:,.0f} edges/s) = "
        f"**{small['wall'] / big['wall']:.2f}x speedup, efficiency {eff:.3f}**",
        "",
        "| iteration | t(1 exec) s | changed(1 exec) | t(4 exec) s | changed(4 exec) |",
        "|---|---|---|---|---|",
    ]
    sw, sch = small["stats"]["iter_wall_sec"], small["stats"]["iter_changed"]
    bw, bch = big["stats"]["iter_wall_sec"], big["stats"]["iter_changed"]
    for i in range(max(len(sw), len(bw))):
        lines.append(
            f"| {i + 1} | {sw[i] if i < len(sw) else ''} | {sch[i] if i < len(sch) else ''} "
            f"| {bw[i] if i < len(bw) else ''} | {bch[i] if i < len(bch) else ''} |"
        )
    lines += [
        "",
        f"raw small: `{json.dumps(small)}`",
        f"raw big:   `{json.dumps(big)}`",
        "",
    ]
    out_path = ROOT / "BENCH" / "BASELINE.md"
    out_path.write_text(out_path.read_text() + "\n".join(lines))
    print(json.dumps({"cc_eff": round(eff, 3),
                      "small_wall": small["wall"], "big_wall": big["wall"]}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
