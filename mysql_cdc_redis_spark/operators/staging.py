"""Per-invocation parquet staging — the package's eviction-proof
alternative to ``.persist()`` for relations that must outlive the call
that builds them.

Two staging/caching disciplines coexist across the operators, chosen by
how long a relation must live:

* RETURNED relations (an operator's materialized result; long-lived
  intermediates under heavy sort/shuffle pressure, where relying on
  executor storage memory was measured at 3-4× wall amplification at
  sf10 — SCALING.md round 4) are staged HERE: a parquet scan survives
  any memory pressure and leaves nothing in ``getPersistentRDDs()``
  (pinned by tests/test_dedup_hygiene.py).
* TRANSIENT relations consumed only while their operator runs (shingle
  sets, signatures, pre-batch state) use ``.persist()`` scoped by
  try/finally around an EAGER materialization of the (small) result —
  cheaper than an encode+write at benign scale (measured at sf1:
  staging the shingle relation cost 13.9s of a 35s naive-route total,
  round 5), and MEMORY_AND_DISK spills rather than recomputes.

The staging directory is per-invocation unique (concurrent sessions
never race — the merge_4x staging rule) and reaped at process exit
with an idempotent ``rmtree``."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


def stage_parquet(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` to a per-invocation tmp parquet directory and
    return a scan over it (see module docstring for when to prefer this
    over a scoped persist)."""
    d = tempfile.mkdtemp(prefix=f"stage_{name}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    df.write.mode("overwrite").parquet(d)
    return df.sparkSession.read.parquet(d)
