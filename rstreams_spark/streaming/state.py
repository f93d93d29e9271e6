"""State-store provider configuration for the streaming layer.

The reference persists operator state in an embedded B-tree KV store
(redb — /root/reference/src/store.rs); its Spark analog is the state
store behind every stateful streaming operator. The default
HDFS-backed provider keeps the working set on the JVM heap, which at
100 TB-scale key cardinalities (dedup fingerprints, per-key window
buffers) becomes an executor-memory ceiling. RocksDB keeps state on
local disk with a block-cache in native memory — the provider OSS
Spark ships for exactly that regime (rocksdbjni is bundled with
pyspark). These helpers make switching a one-liner and are exercised
by a real checkpoint-restart test (tests/test_streaming.py).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

# changelog checkpointing ships RocksDB deltas instead of full
# SST snapshots each commit — the setting you'd run with on a
# real cluster where the checkpoint dir is object storage
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def rocksdb_state_conf(changelog_checkpointing: bool = True) -> dict[str, str]:
    """Session confs enabling the RocksDB state store provider.

    Pass to ``session.get_spark(extra_conf=...)`` or apply with
    ``spark.conf.set`` before starting a stateful query (the provider
    is fixed per query at start, from the session conf).
    """
    conf = {_PROVIDER_KEY: ROCKSDB_PROVIDER}
    if changelog_checkpointing:
        conf[_CHANGELOG_KEY] = "true"
    return conf


@contextmanager
def rocksdb_state(spark: SparkSession) -> Iterator[None]:
    """Scoped enable: queries STARTED inside the block use RocksDB
    state stores; the previous provider is restored on exit (running
    queries keep the provider they started with)."""
    old: dict[str, str | None] = {}
    for k, v in rocksdb_state_conf().items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, prev in old.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)
