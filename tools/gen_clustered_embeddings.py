#!/usr/bin/env python3
"""Generate fixtures/clustered_embeddings.parquet: 8 well-separated
gaussian clusters x 60 vectors in 64-d (float32), the regime where PQ's
ADC scan + exact rerank recovers the exact brute-force top-k — which is
what makes q74 oracle-checkable (the synthetic near-uniform
/root/testdata embeddings are not: ADC ordering there is uninformative).
Deterministic: numpy default_rng(7)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

rng = np.random.default_rng(7)
centers = rng.standard_normal((8, 64)).astype(np.float32)
vec_ids, vecs = [], []
for c in range(8):
    for i in range(60):
        vec_ids.append(c * 60 + i)
        vecs.append(centers[c] + 0.15 * rng.standard_normal(64).astype(np.float32))
table = pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
})
pq.write_table(table, "fixtures/clustered_embeddings.parquet")
print("wrote fixtures/clustered_embeddings.parquet:", table.num_rows, "rows")
