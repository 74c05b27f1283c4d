"""Entity linking / IRI canonicalization (SURVEY.md §2.3 actor-pool stage).

Maps ``unlinked:NAME`` mention objects (imports → module names, calls →
function names) to canonical symbol IRIs via a shared symbol dictionary.

Ray mapping: the dictionary is the SMALL side — built once with a
distributed aggregation, then broadcast via ``ray.put`` and read once per
actor in ``__init__`` (``map_batches(SymbolLinker, concurrency=N,
fn_constructor_args=(ref,))``) — never re-shipped per batch and never a
shuffle join.  Canonical resolution is *deterministic* (lexicographically
smallest defining IRI), so actors agree without any coordination — the
design requirement called out in SURVEY.md §2.3.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .extract import BASE, ONT, RDF_TYPE

EXTERN_PREFIX = f"{BASE}/extern/"


def build_symbol_dict_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: emit (name, iri) candidate pairs from type triples.

    Modules contribute their dotted name; functions/classes their bare name.
    """
    is_type = pc.equal(batch.column("p_value"), RDF_TYPE)
    sub = batch.filter(is_type)
    names: list[str] = []
    iris: list[str] = []
    for s, o in zip(sub.column("s_value").to_pylist(), sub.column("o_value").to_pylist()):
        # s looks like https://codekg.dev/sym/<repo0>/<repo1>/<dotted[.name]>
        tail = s.rsplit("/", 1)[-1]
        if o == ONT + "Module":
            names.append(tail)
            iris.append(s)
        elif o in (ONT + "Function", ONT + "Class"):
            names.append(tail.rsplit(".", 1)[-1])
            iris.append(s)
    return pa.table({"name": pa.array(names, pa.string()), "iri": pa.array(iris, pa.string())})


def _batch_min_by_name(batch: pa.Table) -> pa.Table:
    """Local combine: min(iri) per name within one batch (pre-shuffle shrink)."""
    if batch.num_rows == 0:
        return batch
    g = batch.group_by(["name"]).aggregate([("iri", "min")])
    return g.select(["name", "iri_min"]).rename_columns(["name", "iri"])


def collect_symbol_dict(triples_ds) -> dict[str, str]:
    """Build the canonical symbol dictionary (the broadcast small side).

    Candidates are combined per batch (min per name), then the ≤|symbols|
    rows stream to the driver where the global min-merge happens — a fold,
    not a shuffle.  The dict must fit in memory regardless (it is broadcast
    to every linker actor), so the driver merge adds no new scale limit.
    """
    small = triples_ds.map_batches(build_symbol_dict_batch, batch_format="pyarrow").map_batches(
        _batch_min_by_name, batch_format="pyarrow"
    )
    out: dict[str, str] = {}
    for batch in small.iter_batches(batch_format="pyarrow"):
        for name, iri in zip(batch.column("name").to_pylist(), batch.column("iri").to_pylist()):
            prev = out.get(name)
            if prev is None or iri < prev:
                out[name] = iri
    return out


def _link_batch(symbols: dict[str, str], batch: pa.Table) -> pa.Table:
    o_value = batch.column("o_value")
    mask = pc.starts_with(o_value, "unlinked:")
    if pc.sum(mask).as_py() in (0, None):
        return batch
    values = o_value.to_pylist()
    flags = mask.to_pylist()
    for i, (v, f) in enumerate(zip(values, flags)):
        if f:
            name = v[9:]
            hit = symbols.get(name) or symbols.get(name.rsplit(".", 1)[-1])
            values[i] = hit if hit is not None else EXTERN_PREFIX + name
    idx = batch.schema.get_field_index("o_value")
    return batch.set_column(idx, "o_value", pa.array(values, pa.string()))


class SymbolLinker:
    """Actor-pool stage: canonicalize ``unlinked:`` objects.

    ``symbols`` may be a plain dict or a ``ray.ObjectRef`` to one (broadcast
    with ``ray.put``); resolved once per actor here in ``__init__``.
    """

    def __init__(self, symbols) -> None:
        try:
            import ray

            if isinstance(symbols, ray.ObjectRef):
                symbols = ray.get(symbols)
        except ImportError:
            pass
        self.symbols: dict[str, str] = symbols

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _link_batch(self.symbols, batch)


def make_linker_task(sym_ref):
    """Task-based linker: no actor startup; the dict ref is resolved from
    the object store per task (zero-copy plasma read, cached per node).

    Preferred over the actor pool when the dict is read-only — fully elastic
    and adds no pool warm-up to the critical path.
    """

    import ray

    def link(batch: pa.Table) -> pa.Table:
        symbols = ray.get(sym_ref)
        return _link_batch(symbols, batch)

    return link
