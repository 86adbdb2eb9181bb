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
never race — the merge_4x staging rule).  Lifecycle: INTRA-CALL staging
(relations consumed only while their operator runs — shingle/prefix/
array relations feeding an eagerly-executed sliced join) must be reaped
by the operator via ``reap_staged`` as soon as its eager execution
finishes; only a RETURNED relation's directory may outlive the call.
The ``atexit`` rmtree stays registered as the idempotent backstop for
exception paths and for returned relations — without the eager reap, a
long-lived driver invoking dedup ops repeatedly accumulates unbounded
/tmp disk (multi-GB per call at sf10)."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def stage_parquet(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` to a per-invocation tmp parquet directory and
    return a scan over it (see module docstring for when to prefer this
    over a scoped persist).  The scan carries its directory as
    ``_staging_dir`` so the operator can ``reap_staged`` it the moment
    no live plan reads it."""
    d = tempfile.mkdtemp(prefix=f"stage_{name}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    df.write.mode("overwrite").parquet(d)
    scan = df.sparkSession.read.parquet(d)
    scan._staging_dir = d
    return scan


def reap_staged(*scans: DataFrame) -> None:
    """Delete the staging directories behind ``stage_parquet`` scans
    that no live plan will read again — the CALLER asserts that.  No-op
    for DataFrames that were never staged (e.g. a persisted relation
    handed through the same code path); idempotent with the atexit
    backstop (rmtree ignore_errors)."""
    for scan in scans:
        d = getattr(scan, "_staging_dir", None)
        if d:
            shutil.rmtree(d, ignore_errors=True)


def staged_bytes(scan: DataFrame) -> int | None:
    """On-disk size of a ``stage_parquet`` scan's directory (None when
    the DataFrame wasn't staged) — the input to bucket-count sizing."""
    d = getattr(scan, "_staging_dir", None)
    if not d or not os.path.isdir(d):
        return None
    return sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(d)
        for f in files
    )
