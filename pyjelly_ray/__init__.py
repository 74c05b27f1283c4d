"""pyjelly_ray — a Ray-Data-native knowledge-graph construction engine.

Capabilities (re-expressed Ray-Data-first, from-scratch — see SURVEY.md):
- ``pyjelly_ray.jelly``: Jelly RDF binary protocol codec (wire-compatible
  with the reference pyjelly implementation).
- ``pyjelly_ray.stages``: batch transforms (triple extraction, entity
  linking, dedup, text analysis, similarity search, multimodal plumbing).
- ``pyjelly_ray.sources`` / ``pyjelly_ray.sinks``: Jelly file reading into
  Datasets and sharded Jelly writing with lineage manifests.
- ``pyjelly_ray.pipelines``: end-to-end Dataset pipelines (KG construct,
  relational/benchmark queries).

Nothing in this package calls ``ray.init`` — sessions are owned by the
driver, bench.py, or the test fixture.
"""

__version__ = "0.1.0"
