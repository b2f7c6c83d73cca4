"""Embeddings-only scratch corpus at arbitrary N (VERDICT r13 #1).

Round 13's .scratch/emb600k (600k vectors) was the largest near-dup /
ANN measurement corpus; round 14 needs one PAST the old
CLUS_K_CAP = 65536 regime boundary (k = N/24 > 65536 ⇔ N > ~1.57M) to
measure the uncapped stage-2 assignment where the r13 design would
have coarsened.  Same distribution family as
``gen_testdata.generate``'s embeddings block (10 Gaussian clusters,
centroid norm ~0.016, noise σ 0.125, L2-normalized, float32) — the
recall/candidate comparisons are within-corpus, and cross-N exponents
need identical DISTRIBUTION, not an identical RNG stream.  Chunked so
peak memory stays ~flat in N.

Usage: python tools/gen_embeddings.py N OUTDIR
  e.g. python tools/gen_embeddings.py 2400000 /root/repo/.scratch/emb2m4
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM, K = 64, 10
CHUNK = 200_000


def generate(n: int, out: Path, seed: int = 777) -> None:
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 0.016, (K, DIM))
    writer = None
    for start in range(0, n, CHUNK):
        m = min(CHUNK, n - start)
        labels = rng.integers(0, K, m)
        vecs = centers[labels] + rng.normal(0, 0.125, (m, DIM))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tbl = pa.table(
            {
                "vec_id": np.arange(start, start + m),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)),
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                out / "embeddings.parquet", tbl.schema, compression="snappy"
            )
        writer.write_table(tbl)
    if writer is not None:
        writer.close()
    print(f"wrote {n} vectors to {out}")


if __name__ == "__main__":
    n = int(sys.argv[1])
    out = Path(sys.argv[2])
    generate(n, out)
