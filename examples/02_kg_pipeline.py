"""End-to-end KG construction on a synthesized corpus.

Run: python examples/02_kg_pipeline.py
"""

import sys

sys.path.insert(0, ".")

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False)

from pyjelly_ray.pipelines.corpus import write_corpus_parquet
from pyjelly_ray.pipelines.kg import build_kg
from pyjelly_ray.state.manifest import summarize

corpus = write_corpus_parquet("/tmp/example_corpus.parquet", seed=1, n_files=500)
manifests = build_kg(corpus, "/tmp/example_kg", n_shards=4).take_all()
print("shards written:", len(manifests))
print("summary:", summarize("/tmp/example_kg"))

from pyjelly_ray.sources.jelly_source import read_jelly

stmts = read_jelly("/tmp/example_kg")
print("statements decoded back:", stmts.count())
ray.shutdown()
