"""Interleaved A/B of the id-assignment pass at synthetic scale (r8).

Measures ONLY the assignment stage of encode_vertices — the part r8
changed — over one shared cached dictionary input in one JVM:

* ``window``: the prior plan — Exchange hashpartitioning(pid) +
  Sort(pid, oid) + Window(row_number) over all V rows, then the
  broadcast offset join;
* ``mid``: the shipped plan — position decoded from
  ``monotonically_increasing_id()`` low bits over the cache scan
  (0 exchanges, 0 sorts).

Both paths produce identical ids (asserted on the first pair). The
interleaved-pairs protocol is the repo's standard for sub-2x claims
(host noise floor, BENCH/BASELINE.md).

Run: python scripts/bench_encode_ab.py [n_conversations] [pairs]
Writes BENCH/runs/encode_ab_<epoch>.json and prints one JSON line.
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
    from pyspark.sql.window import Window

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.edges import _edges_from_prev, _with_prev
    from libgrape_lite_spark.plans.kernels import release_pinned
    from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(
        app_name=f"encode-ab-c{C}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = synthesize_transcripts(spark, C, seed=42).localCheckpoint(eager=True)
    wp = _with_prev(t).localCheckpoint(eager=True)
    e = _edges_from_prev(wp).localCheckpoint(eager=True)
    oids = (
        e.select(F.col("src_oid").alias("oid"))
        .unionByName(e.select(F.col("dst_oid").alias("oid")))
        .unionByName(
            wp.select(
                F.concat("conv_id", F.lit(":"), F.col("turn_idx").cast("string")).alias("oid")
            )
        )
    )

    def run(mode: str, check: bool = False):
        sorted_oids = (
            oids.select("oid").distinct()
            .repartitionByRange(CPUS, "oid").sortWithinPartitions("oid").cache()
        )
        counts = (
            sorted_oids.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid").count().collect()
        )
        cbp = {r["pid"]: r["count"] for r in counts}
        offs, acc = [], 0
        for pid in range(max(cbp, default=-1) + 1):
            offs.append((pid, acc))
            acc += cbp.get(pid, 0)
        off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, off long")
        t0 = time.time()
        if mode == "window":
            w = Window.partitionBy("pid").orderBy("oid")
            out = (
                sorted_oids.withColumn("pid", F.spark_partition_id())
                .join(F.broadcast(off_df), "pid")
                .select((F.row_number().over(w) - 1 + F.col("off")).alias("id"), "oid")
            )
        else:
            mid = F.monotonically_increasing_id()
            out = (
                sorted_oids.select("oid", mid.alias("_mid"))
                .withColumn("pid", F.shiftright("_mid", 33).cast("int"))
                .join(F.broadcast(off_df), "pid")
                .select(
                    (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.col("off")).alias("id"),
                    "oid",
                )
            )
        ck = out.localCheckpoint(eager=True)
        dt = round(time.time() - t0, 3)
        digest = None
        if check:
            # order-insensitive equality probe: sum of truncated row hashes
            # (40-bit per row so 10^7 rows cannot overflow ANSI long math)
            digest = ck.agg(
                F.sum(
                    F.xxhash64("id", "oid").bitwiseAND(F.lit((1 << 40) - 1))
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0].asDict()
        release_pinned(ck)
        sorted_oids.unpersist()
        return dt, digest

    # warm both codegen paths, and assert identical assignments once
    _, d_mid = run("mid", check=True)
    _, d_win = run("window", check=True)
    assert d_mid == d_win, (d_mid, d_win)

    pairs = []
    for _ in range(PAIRS):
        a, _ = run("mid")
        b, _ = run("window")
        pairs.append({"mid": a, "window": b, "delta": round(b - a, 3)})

    try:
        loadavg_at_end = list(os.getloadavg())
    except OSError:
        loadavg_at_end = []
    out = {
        "n_conversations": C,
        "n_oids_distinct": d_mid["n"],
        "pairs": pairs,
        "median_mid_sec": statistics.median(p["mid"] for p in pairs),
        "median_window_sec": statistics.median(p["window"] for p in pairs),
        "mid_wins": sum(1 for p in pairs if p["delta"] > 0),
        "cpus": CPUS,
        "loadavg_at_start": loadavg_at_start,
        "loadavg_at_end": loadavg_at_end,
        "quotable_idle_start": bool(loadavg_at_start and loadavg_at_start[0] < 2.0),
    }
    try:
        RUNS_DIR.mkdir(parents=True, exist_ok=True)
        (RUNS_DIR / f"encode_ab_{int(time.time())}.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
