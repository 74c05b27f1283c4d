"""Composed training-corpus prep: filter → dedup → split → resumable export.

The same plan as the SQL-checked `q_corpus_prep` query, then written as
resumable partitioned Parquet (re-running skips finished partitions).

Run: python examples/05_corpus_prep.py
"""

import shutil
import sys

sys.path.insert(0, ".")

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False)

from pyjelly_ray.pipelines.relational import QUERIES
from pyjelly_ray.sinks.parquet_sink import write_partitioned_parquet

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/example_corpus_prep"
shutil.rmtree(OUT, ignore_errors=True)

stats = QUERIES["q_corpus_prep"](SF_DIR)
print("per-(lang, split) stats:")
for row in stats.sort("lang").take_all():
    print("  ", row)

manifest = write_partitioned_parquet(
    QUERIES["q_corpus_prep"](SF_DIR), OUT, partition_cols=["split"], num_partitions=8
)
print("wrote partitions:")
print(manifest.to_pandas()[["partition", "rows", "status"]].to_string(index=False))
manifest2 = write_partitioned_parquet(
    QUERIES["q_corpus_prep"](SF_DIR), OUT, partition_cols=["split"], num_partitions=8
)
print("second run (resume — everything skipped):")
print(manifest2.to_pandas()[["partition", "rows", "status"]].to_string(index=False))
ray.shutdown()
