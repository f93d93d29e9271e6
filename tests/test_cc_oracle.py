"""The iterative (bounded-memory) CC oracle must equal the catalog's
recursive-CTE oracle — the bridge that lets the sf1 replica cover
dedup_clusters / dedup_keep_best (VERDICT r10 item 4: the recursive
``reach`` relation is all-pairs reachability, >44 GB at sf1).

DuckDB-only (no Spark session): both oracles run on the same parquet
views and must produce identical frames at sf0.01 AND sf0.1 — the
same two SFs the catalog entries are driver/replica-verified at.
"""

import os
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from cc_oracle import (  # noqa: E402
    ITERATIVE_CC_NAMES, run_iterative, union_find_clusters,
)

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def _con(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "create view documents as "
        f"select * from '{sf_dir}/documents.parquet'"
    )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "sf_dir",
    [SF001,
     pytest.param(SF01, marks=pytest.mark.skipif(
         not os.path.isdir(SF01), reason="sf0.1 absent"))],
)
@pytest.mark.parametrize("name", ITERATIVE_CC_NAMES)
def test_iterative_matches_recursive_cte(sf_dir, name):
    import __spark_entry__ as e

    con = _con(sf_dir)
    recursive = con.sql(e.oracle_sql()[name]).df()
    iterative = run_iterative(con, name)
    assert sorted(recursive.columns) == sorted(iterative.columns)
    pd.testing.assert_frame_equal(_canon(recursive), _canon(iterative))


def test_union_find_min_reachable_semantics():
    """min-of-component == min-reachable-id, including chains whose
    min enters through either endpoint, plus singleton-pair nodes."""
    pairs = pd.DataFrame(
        {"id1": [5, 3, 10, 20, 8], "id2": [3, 1, 5, 21, 8]}
    )
    out = union_find_clusters(pairs).set_index("doc_id")["cluster_id"]
    assert out[5] == 1 and out[3] == 1 and out[1] == 1 and out[10] == 1
    assert out[20] == 20 and out[21] == 20
    assert out[8] == 8  # self-pair keeps the node, cluster = itself
    assert len(out) == 7
