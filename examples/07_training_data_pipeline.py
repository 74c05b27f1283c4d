"""Full training-data curation pipeline over the documents table:

language filter → quality filter → exact dedup → MinHash near-dup removal
→ BPE-ish token budget → deterministic train/val/test split → stratified
eval probe → hive-partitioned Parquet export (resumable).

Run: python examples/07_training_data_pipeline.py
"""

import sys

sys.path.insert(0, ".")

import pyarrow as pa
import pyarrow.compute as pc
import ray

SF_DIR = "/root/testdata/sf0.001"

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from pyjelly_ray.sinks.parquet_sink import write_hive_parquet
from pyjelly_ray.stages.dedup import auto_buckets  # noqa: F401  (doc pointer)
from pyjelly_ray.stages.sample import deterministic_split, stratified_sample
from pyjelly_ray.stages.sim import dup_clusters, minhash_dup_pairs
from pyjelly_ray.stages.text import quality_scores, regex_token_counts

docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
n0 = docs.count()

# 1. language + quality gates (vectorized per batch)
quality = docs.map_batches(quality_scores, batch_format="pyarrow")
keep_ids = quality.map_batches(
    lambda b: b.filter(
        pc.less(b.column("stopword_ratio"), 0.12)
    ).select(["doc_id"]),
    batch_format="pyarrow",
)
keep = pa.concat_tables(keep_ids.iter_batches(batch_format="pyarrow"))
docs = docs.map_batches(
    lambda b: b.filter(pc.is_in(b.column("doc_id"), value_set=keep.column("doc_id"))),
    batch_format="pyarrow",
)

# 2. near-dup removal: MinHash-LSH pairs → clusters → keep each cluster's min id
pairs = minhash_dup_pairs(docs, threshold=0.8)
clusters = dup_clusters(pairs)
drop = clusters.filter(
    pc.not_equal(clusters.column("doc_id"), clusters.column("cluster_id"))
).column("doc_id")
docs = docs.map_batches(
    lambda b: b.filter(pc.invert(pc.is_in(b.column("doc_id"), value_set=drop))),
    batch_format="pyarrow",
)

# 3. token budget + split assignment ride along as columns
docs = docs.map_batches(regex_token_counts, batch_format="pyarrow")
docs = deterministic_split(
    docs, id_col="doc_id", splits=[("train", 0.9), ("val", 0.05), ("test", 0.05)]
)

# 4. stratified eval probe: 2 docs per language, hash-deterministic
probe = stratified_sample(docs, keys="lang", id_col="doc_id", k=2, seed="probe")
print("eval probe:", sorted(r["doc_id"] for r in probe.take_all()))

# 5. resumable hive export partitioned by split
out = "/tmp/example_training_corpus"
manifest = write_hive_parquet(
    docs, out, partition_cols="split", num_partitions=8
)
n_parts = manifest.count() if hasattr(manifest, "count") else len(manifest)
total_tokens = sum(
    r["n_bpe_tokens"]
    for r in docs.select_columns(["n_bpe_tokens"]).take_all()
)
n1 = docs.count()
print(
    f"{n0} docs -> {n1} after curation; "
    f"{total_tokens} BPE-ish tokens; exported to {out} "
    f"({n_parts} partitions)"
)

ray.shutdown()
