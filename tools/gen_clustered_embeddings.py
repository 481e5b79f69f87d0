#!/usr/bin/env python3
"""Generate clustered embedding fixtures: C well-separated gaussian
clusters x P vectors in 64-d (float32).

Default (no args) writes fixtures/clustered_embeddings.parquet — 8
clusters x 60 vectors, the regime where PQ's ADC scan + exact rerank
recovers the exact brute-force top-k, which is what makes q74
oracle-checkable (the synthetic near-uniform /root/testdata embeddings
are not: ADC ordering there is uninformative). Deterministic: numpy
default_rng(7). The default path reproduces the COMMITTED fixture
byte-for-byte (same rng call sequence), so never reorder it.

With args `<out> <n_clusters> <per_cluster>` it writes an arbitrary
scale of the same shape for the ANN decade probe (tools/AnnProbe):
vec_ids are SHUFFLED across clusters (deterministic permutation) so an
index seeded by lowest-id draws from the whole space, the way a real
corpus sample would — id-ordered cluster blocks would hand the seeds a
worst case no deployment has. Generation is chunked so multi-million
row fixtures stream instead of materializing one giant list.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

rng = np.random.default_rng(7)

if len(sys.argv) <= 1:
    # committed-fixture mode: EXACT original generation sequence
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
    sys.exit(0)

out = sys.argv[1]
n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
per_cluster = int(sys.argv[3]) if len(sys.argv) > 3 else 60

centers = rng.standard_normal((n_clusters, 64)).astype(np.float32)
n = n_clusters * per_cluster
ids = rng.permutation(n).astype(np.int64)  # shuffled id <-> cluster map

schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32()))])
writer = pq.ParquetWriter(out, schema)
chunk = 100_000
for start in range(0, n, chunk):
    end = min(start + chunk, n)
    rows = end - start
    cid = (np.arange(start, end) // per_cluster)
    vecs = centers[cid] + 0.15 * rng.standard_normal((rows, 64)).astype(np.float32)
    writer.write_table(pa.table({
        "vec_id": pa.array(ids[start:end]),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }, schema=schema))
writer.close()
print(f"wrote {out}: {n} rows ({n_clusters} clusters x {per_cluster})")
