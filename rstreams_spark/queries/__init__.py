"""Named query catalog: every SURVEY.md §2 row → (spark_fn, oracle_sql).

``REGISTRY`` maps name → callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name → DuckDB SQL string (absent = rows-only check).
"""

from __future__ import annotations

from . import core, dedupq, textq, tpch

REGISTRY = {}
ORACLES = {}
for mod in (core, tpch, textq, dedupq):
    REGISTRY.update(mod.QUERIES)
    ORACLES.update(mod.SQL_ORACLES)

__all__ = ["REGISTRY", "ORACLES"]
