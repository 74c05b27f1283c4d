"""Near-duplicate detection families over a toy document set.

Run: python examples/03_dedup_families.py
"""

import sys

sys.path.insert(0, ".")

import pyarrow as pa
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False)

from pyjelly_ray.stages.sim import dup_clusters, minhash_dup_pairs, simhash_dup_pairs

docs = ray.data.from_arrow(
    pa.Table.from_pylist(
        [
            {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy cat"},
            {"doc_id": 2, "text": "completely different text about other things"},
            {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog"},
        ]
    )
)

print("minhash pairs:", minhash_dup_pairs(docs, threshold=0.4).take_all())
print("simhash pairs:", simhash_dup_pairs(docs, max_hamming=4).take_all())
print("clusters:", dup_clusters(minhash_dup_pairs(docs, threshold=0.4)).to_pylist())
ray.shutdown()
