"""Interleaved A/B of the at-scale (LocalVertexMap / shuffle-dict)
oid→id translation joins in encode_edges (r8).

* ``smj``: the planner default — two sort-merge joins, each paying a full
  string sort of the edge side and the dictionary side;
* ``shj``: the shipped plan — SHUFFLE_HASH-hinted dictionary sides
  (guide §3.1): the hash build is one dictionary partition, the same
  per-fragment id map the reference's LocalVertexMap holds in memory.

Both produce identical edge tables (asserted by digest on the warm-up
pair). One JVM, shared checkpointed inputs, interleaved pairs — the
repo's protocol for sub-2x claims.

Run: python scripts/bench_encode_edges_ab.py [n_conversations] [pairs]
Writes BENCH/runs/encode_edges_ab_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

C = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS_DIR = Path(__file__).resolve().parent.parent / "BENCH" / "runs"


def main() -> None:
    try:
        loadavg_at_start = list(os.getloadavg())
    except OSError:
        loadavg_at_start = []

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.edges import _edges_from_prev, _turn_oid, _with_prev
    from libgrape_lite_spark.functions.ids import encode_vertices
    from libgrape_lite_spark.plans.kernels import release_pinned
    from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(
        app_name=f"encode-edges-ab-c{C}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = synthesize_transcripts(spark, C, seed=42).localCheckpoint(eager=True)
    wp = _with_prev(t).localCheckpoint(eager=True)
    e_oid = _edges_from_prev(wp).localCheckpoint(eager=True)
    endpoints = e_oid.select(F.col("src_oid").alias("oid")).unionByName(
        e_oid.select(F.col("dst_oid").alias("oid"))
    )
    turns = wp.select(_turn_oid().alias("oid"))
    vertices = encode_vertices(endpoints.unionByName(turns)).localCheckpoint(eager=True)
    extra = [c for c in e_oid.columns if c not in ("src_oid", "dst_oid")]

    def run(mode: str, check: bool = False):
        src_dict = vertices.select(F.col("oid").alias("src_oid"), F.col("id").alias("src"))
        dst_dict = vertices.select(F.col("oid").alias("dst_oid"), F.col("id").alias("dst"))
        if mode == "shj":
            src_dict = src_dict.hint("shuffle_hash")
            dst_dict = dst_dict.hint("shuffle_hash")
        t0 = time.time()
        out = (
            e_oid.join(src_dict, "src_oid")
            .join(dst_dict, "dst_oid")
            .select("src", "dst", *extra)
            .localCheckpoint(eager=True)
        )
        dt = round(time.time() - t0, 3)
        digest = None
        if check:
            digest = out.agg(
                F.sum(
                    F.xxhash64("src", "dst").bitwiseAND(F.lit((1 << 40) - 1))
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0].asDict()
        release_pinned(out)
        return dt, digest

    _, d_smj = run("smj", check=True)
    _, d_shj = run("shj", check=True)
    assert d_smj == d_shj, (d_smj, d_shj)

    pairs = []
    for _ in range(PAIRS):
        a, _ = run("shj")
        b, _ = run("smj")
        pairs.append({"shj": a, "smj": b, "delta": round(b - a, 3)})

    try:
        loadavg_at_end = list(os.getloadavg())
    except OSError:
        loadavg_at_end = []
    out = {
        "n_conversations": C,
        "n_edges": d_smj["n"],
        "pairs": pairs,
        "median_shj_sec": statistics.median(p["shj"] for p in pairs),
        "median_smj_sec": statistics.median(p["smj"] for p in pairs),
        "shj_wins": sum(1 for p in pairs if p["delta"] > 0),
        "cpus": CPUS,
        "loadavg_at_start": loadavg_at_start,
        "loadavg_at_end": loadavg_at_end,
        "quotable_idle_start": bool(loadavg_at_start and loadavg_at_start[0] < 2.0),
    }
    try:
        RUNS_DIR.mkdir(parents=True, exist_ok=True)
        (RUNS_DIR / f"encode_edges_ab_{int(time.time())}.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
