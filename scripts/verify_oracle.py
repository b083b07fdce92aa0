"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at the given sf dir, compares row count, column names/types, and
an order-insensitive value hash. Usage:

    python scripts/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: repr(v))
    rows = sorted(",".join(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from libgrape_lite_spark import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows, {t1 - t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        t2 = time.time()
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if not problems:
            h1, h2 = value_hash(got), value_hash(want)
            if h1 != h2:
                problems.append("value-hash mismatch")
                merged = got.merge(
                    want, on=sorted(set(got.columns) & set(want.columns)), how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
        status = "OK  " if not problems else "FAIL"
        if problems:
            failures += 1
        print(
            f"{status} {name}: {len(got)} rows, spark {t1 - t0:.1f}s duck {t2 - t1:.1f}s"
            + ("" if not problems else f" — {'; '.join(problems)}")
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
