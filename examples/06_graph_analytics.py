"""Graph analytics over the KG dependency edges: PageRank + components.

Run: python examples/06_graph_analytics.py
"""

import sys

sys.path.insert(0, ".")

import ray

from pyjelly_ray.pipelines.corpus import write_corpus_parquet
from pyjelly_ray.pipelines.kg import kg_symbol_pagerank

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

corpus = "/tmp/example_graph_corpus.parquet"
write_corpus_parquet(corpus, seed=11, n_files=600)

top = kg_symbol_pagerank(corpus, iters=6, num_partitions=4, top_k=10)
print("top-10 symbols by dependency PageRank:")
for row in top.take_all():
    print(f"  {row['rank']:.6f}  {row['node']}")

ray.shutdown()
