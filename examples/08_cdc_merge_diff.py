"""Lakehouse-style CDC: apply a change set with MERGE semantics, then
diff the snapshots to audit what changed.

Run: python examples/08_cdc_merge_diff.py
"""

import sys

sys.path.insert(0, ".")

import pyarrow as pa
import ray

from pyjelly_ray.stages.dedup import merge_upsert
from pyjelly_ray.stages.joins import table_diff

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

base = ray.data.from_arrow(
    pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array([f"v1 of doc {i}" for i in range(10)], pa.string()),
        }
    )
).repartition(3)

changes = ray.data.from_arrow(
    pa.table(
        {
            "doc_id": pa.array([2, 5, 5, 11], pa.int64()),
            "text": pa.array(
                ["v2 of doc 2", "v2 of doc 5", "", "brand new doc 11"], pa.string()
            ),
            "op": pa.array(["update", "update", "delete", "insert"], pa.string()),
            "seq": pa.array([1, 1, 2, 1], pa.int64()),
        }
    )
)

merged = merge_upsert(base, changes, key="doc_id", seq_col="seq", num_partitions=4)
print("merged snapshot:")
for r in sorted(merged.take_all(), key=lambda r: r["doc_id"]):
    print(f"  {r['doc_id']}: {r['text']}")

diff = table_diff(base, merged, key="doc_id", compare_cols=["text"], num_partitions=4)
print("diff vs v1:")
for r in sorted(diff.take_all(), key=lambda r: r["doc_id"]):
    print(f"  {r['doc_id']}: {r['change']}")

ray.shutdown()
