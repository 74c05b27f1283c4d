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


def read_corpus(path, columns=None):
    import ray

    return ray.data.read_parquet(
        path, columns=columns or ["repo", "path", "commit", "lang", "content"]
    )


def extract_triples(corpus_ds, *, batch_size: int | None = None):
    """corpus → linked KG triples (no dedup yet)."""
    hashed = corpus_ds.map_batches(ingest_sha256, batch_format="pyarrow", batch_size=batch_size)
    return hashed.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)


def link_triples(triples_ds, *, concurrency=(2, 8)):
    """Two passes over the triple stream: small-side dict build + broadcast link.

    The dict pass aggregates to a tiny table; the link pass is an actor pool
    with the dict resolved once per actor (ray.put broadcast).
    """
    import ray

    symbols = collect_symbol_dict(triples_ds)
    sym_ref = ray.put(symbols)
    return triples_ds.map_batches(
        SymbolLinker,
        fn_constructor_args=(sym_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def build_kg(
    corpus_path,
    out_dir: str,
    *,
    n_shards: int = 16,
    jelly_options: StreamOptions | None = None,
    dedup: bool = True,
):
    """Full pipeline; returns the manifest Dataset (consuming it runs the job)."""
    from ..sinks.jelly_sink import write_kg_shards

    corpus = read_corpus(corpus_path)
    triples = extract_triples(corpus)
    linked = link_triples(triples)
    if dedup:
        linked = dedup_exact(linked)
    return write_kg_shards(linked, out_dir, n_shards=n_shards, options=jelly_options)
