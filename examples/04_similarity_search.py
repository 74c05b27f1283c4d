"""Similarity search over an embedding column (brute force + IVF).

Run: python examples/04_similarity_search.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False)

from pyjelly_ray.stages.ann import cosine_topk, ivf_assign, ivf_centroids, ivf_topk

rng = np.random.RandomState(0)
m = rng.standard_normal((1000, 32)).astype(np.float32)
ds = ray.data.from_arrow(
    pa.table(
        {
            "vec_id": pa.array(range(1000), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
)
query = m[123]

print("exact top-5:", cosine_topk(ds, query, k=5).take_all())

cents = ivf_centroids(ds, 16)
assigned = ivf_assign(ds, cents)
print("ivf top-5 (nprobe=4):", ivf_topk(assigned, cents, query, k=5, nprobe=4).take_all())
ray.shutdown()
