"""Clustered embedding fixture for the ANN recall-vs-cost measurement
(round-8 verdict #3): a seeded mixture of Gaussians with the SAME
schema as the driver's embeddings.parquet (vec_id bigint, embedding
list<float>, label int), so every catalog/operator path reads it
unchanged.

The driver's fixture embeddings are isotropic random — ANN's worst
case, measured in COVERAGE.md as the floor.  Real text/image embeddings
are clustered; this fixture makes that case measurable: ``n_clusters``
unit-norm Gaussian centers, per-vector noise ``sigma`` per dimension
(noise norm ≈ sigma·√dim, so sigma=0.05 at dim=64 gives within-cluster
cosine ≈ 0.85-0.9 vs ≈ 0 across clusters — separated, not degenerate).

Cluster assignment is ``vec_id % n_clusters`` BY CONSTRUCTION so the
engine's deterministic ANN conventions stay meaningful without luck:
query vectors (vec_id < 8) cover every cluster once, and the IVF seed
centroids (vec_id 8..23) cover every cluster exactly twice — the
fixture analog of building the coarse quantizer from a corpus sample
that actually hits every mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def clustered_embeddings_table(
    n: int = 500,
    dim: int = 64,
    n_clusters: int = 8,
    sigma: float = 0.05,
    seed: int = 97,
) -> pa.Table:
    """The fixture as an arrow table (deterministic for a given seed)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters
    vecs = centers[labels] + sigma * rng.standard_normal((n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), type=pa.int32()),
        }
    )


def write_clustered_embeddings(out_dir: str, **kw) -> str:
    """Write embeddings.parquet under ``out_dir`` (load_table-shaped);
    returns out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        clustered_embeddings_table(**kw), os.path.join(out_dir, "embeddings.parquet")
    )
    return out_dir
