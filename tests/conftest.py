from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE_DATASET = Path("/root/reference/dataset")
TESTDATA = Path("/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from libgrape_lite_spark import get_spark

    import os

    s = get_spark(
        app_name="libgrape-lite-spark-tests",
        master="local[4]",
        # 4 by default (r7): suite data is tiny, and halving the tasks per
        # superstep job cut the wall clock measurably; tests that assert
        # partitioning behavior pass num_fragments explicitly, so the
        # session default only sets job granularity
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_PARTITIONS", "4")),
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.session.timeZone": "UTC",
        },
    )
    yield s


def make_edges(spark, pairs, weights=None):
    """[(src, dst)] or [(src, dst, w)] → edges DataFrame."""
    rows = []
    for i, p in enumerate(pairs):
        if len(p) == 3:
            rows.append((int(p[0]), int(p[1]), float(p[2])))
        else:
            w = weights[i] if weights else 1.0
            rows.append((int(p[0]), int(p[1]), float(w)))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def make_vertices(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")
