"""End-to-end KG construction pipeline (the flagship, BASELINE.json north_star).

    read_parquet(corpus)                      # column-pruned, streaming
      → map_batches(ingest_sha256)            # per-row invariant column
      → map_batches(TripleExtractor)          # stateless fan-out, Arrow
      → map_batches(SymbolLinker, actors)     # broadcast dict, no shuffle
      → dedup_exact                           # the one all-to-all shuffle
      → write_kg_shards                       # repo-bucketed, sorted,
                                              # deterministic Jelly bytes,
                                              # manifests + resume

Every stage is a Dataset transform; nothing materializes the corpus.  The
driver (or bench.py) owns the Ray session.
"""

from __future__ import annotations

from ..jelly.options import StreamOptions
from ..stages.dedup import dedup_exact
from ..stages.extract import extract_batch, ingest_sha256
from ..stages.link import SymbolLinker, collect_symbol_dict


def read_corpus(path, columns=None, override_num_blocks: int | None = None):
    import ray

    if override_num_blocks is None:
        # spread extraction across the cluster even for few input files
        override_num_blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 2, 16)
    return ray.data.read_parquet(
        path,
        columns=columns or ["repo", "path", "commit", "lang", "content"],
        override_num_blocks=override_num_blocks,
    )


def extract_triples(corpus_ds, *, batch_size: int | None = None):
    """corpus → linked KG triples (no dedup yet)."""
    hashed = corpus_ds.map_batches(ingest_sha256, batch_format="pyarrow", batch_size=batch_size)
    return hashed.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)


def link_triples(triples_ds, *, use_actors: bool = False, concurrency=(2, 8)):
    """Two passes over the triple stream: small-side dict build + broadcast link.

    The dict pass combines down to ≤|symbols| rows; the link pass reads the
    ``ray.put`` dict from the object store (task path by default — zero
    warm-up; set ``use_actors=True`` for the actor-pool variant when the
    setup cost amortizes, e.g. a model-backed linker).
    """
    import ray

    from ..stages.link import make_linker_task

    sym_table = collect_symbol_dict(triples_ds)  # Arrow (name, iri), sorted
    sym_ref = ray.put(sym_table)
    if use_actors:
        return triples_ds.map_batches(
            SymbolLinker,
            fn_constructor_args=(sym_ref,),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return triples_ds.map_batches(make_linker_task(sym_ref), batch_format="pyarrow")


def build_kg(
    corpus_path,
    out_dir: str,
    *,
    n_shards: int = 16,
    jelly_options: StreamOptions | None = None,
    dedup: bool = True,
):
    """Full pipeline; returns the manifest Dataset (consuming it runs the job).

    The triple stream is materialized ONCE (it is ~10× smaller than the
    corpus: ``content`` is dropped at extraction) and reused for the symbol
    dictionary, the hot-repo salting plan, and the link+dedup+write chain —
    one extraction pass instead of three.
    """
    from ..sinks.jelly_sink import collect_repo_counts, write_kg_shards

    corpus = read_corpus(corpus_path)
    triples = extract_triples(corpus).materialize()
    repo_counts = collect_repo_counts(triples)
    linked = link_triples(triples)
    if dedup:
        linked = dedup_exact(linked)
    return write_kg_shards(
        linked, out_dir, n_shards=n_shards, options=jelly_options, repo_counts=repo_counts
    )
