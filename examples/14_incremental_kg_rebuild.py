"""Incremental KG rebuild: append files to the corpus, rerun into the SAME
output directory — only shards whose exact row multiset changed are
re-encoded (manifest `row_xor` skip key); the result is byte-identical to
a fresh full rebuild.  Shrinking the corpus + `prune_orphans` restores
full-rebuild equivalence the other way.

Run: python examples/14_incremental_kg_rebuild.py
"""

import glob
import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import pyarrow.parquet as pq
import ray

from pyjelly_ray.pipelines import corpus as corpus_mod
from pyjelly_ray.pipelines.kg import build_kg
from pyjelly_ray.state.manifest import summarize

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

work = tempfile.mkdtemp(prefix="kg_incremental_")
corpus_dir = os.path.join(work, "corpus")
os.makedirs(corpus_dir)
out = os.path.join(work, "kg")

# day 0: build the full KG
corpus_mod.write_corpus_parquet(os.path.join(corpus_dir, "day0.parquet"),
                                seed=7, n_files=400)
rows = build_kg(corpus_dir, out, n_shards=16).take_all()
print("day 0:", summarize(out)["n_statements"], "statements,",
      len(rows), "shards written")

# day 1: the corpus GROWS (next files of the same deterministic generator)
delta = corpus_mod.corpus_slice_table(7, 400, 420)
pq.write_table(delta, os.path.join(corpus_dir, "day1.parquet"),
               row_group_size=8192)
rows = build_kg(corpus_dir, out, n_shards=16).take_all()
written = sorted(r["shard"] for r in rows if r["status"] == "written")
skipped = [r for r in rows if r["status"] == "skipped"]
print(f"day 1: +20 files -> {len(written)} shards re-encoded "
      f"({written}), {len(skipped)} skipped untouched")

# proof: a from-scratch rebuild of the appended corpus is byte-identical
fresh = os.path.join(work, "kg_fresh")
build_kg(corpus_dir, fresh, n_shards=16).take_all()
dig = lambda d: {
    os.path.basename(f): hashlib.sha256(open(f, "rb").read()).hexdigest()
    for f in glob.glob(os.path.join(d, "part-*.jelly"))
}
assert dig(out) == dig(fresh)
print("incremental output byte-identical to full rebuild:",
      len(dig(out)), "shards")

shutil.rmtree(work, ignore_errors=True)
ray.shutdown()
