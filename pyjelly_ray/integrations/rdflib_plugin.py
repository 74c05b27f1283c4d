"""rdflib plugin: serialize/parse rdflib graphs in the Jelly format.

Covers the reference's rdflib integration surface
(/root/reference/pyjelly/integrations/rdflib/serialize.py:267-310,
parse.py:530-560, entry points pyproject.toml:111-117) re-expressed over
THIS repo's tuple term model and wire codec (encode_flat/decode_flat —
including the compiled folds when the stream shape allows).  Env-gated:
rdflib is not installed in this container (SURVEY §0), so the module
imports cleanly without it and `register()` raises a clear error; the CLI
(`to-jelly` / `from-jelly`) remains the rdflib-free substitute.  Tests in
tests/test_rdflib_plugin.py run only when rdflib is importable.

Usage (with rdflib installed):

    from pyjelly_ray.integrations.rdflib_plugin import register
    register()
    g = rdflib.Graph()
    g.parse("data.jelly", format="jelly")          # or format="application/x-jelly-rdf"
    g.serialize("out.jelly", format="jelly")

Quads: serializing a ConjunctiveGraph/Dataset emits a FLAT_QUADS stream
(default graph encoded as the Jelly default-graph term); parsing a quad
stream into a context-aware sink routes each statement to its named graph.
"""

from __future__ import annotations

from typing import IO, Any

try:  # pragma: no cover - exercised only where rdflib exists
    import rdflib
    from rdflib.parser import Parser as _RdflibParser
    from rdflib.serializer import Serializer as _RdflibSerializer

    HAVE_RDFLIB = True
except ImportError:  # container default
    HAVE_RDFLIB = False
    _RdflibParser = object  # type: ignore[assignment,misc]
    _RdflibSerializer = object  # type: ignore[assignment,misc]

from .. import terms as T
from ..jelly.decode import decode_flat
from ..jelly.encode import encode_flat
from ..jelly.options import (
    LOGICAL_FLAT_QUADS,
    LOGICAL_FLAT_TRIPLES,
    PHYSICAL_QUADS,
    PHYSICAL_TRIPLES,
    StreamOptions,
)

JELLY_CONTENT_TYPE = "application/x-jelly-rdf"
JELLY_EXTENSION = "jelly"


def _to_term(node: Any) -> tuple:
    """rdflib node → engine term tuple."""
    if isinstance(node, rdflib.URIRef):
        return T.iri(str(node))
    if isinstance(node, rdflib.Literal):
        return T.literal(
            str(node),
            lang=node.language,
            # str() explicitly: URIRef overrides __eq__ vs plain str
            datatype=str(node.datatype) if node.datatype else None,
        )
    if isinstance(node, rdflib.BNode):
        return T.bnode(str(node))
    raise TypeError(f"unsupported rdflib term: {node!r}")


def _from_term(t: tuple) -> Any:
    """Engine term tuple → rdflib node."""
    kind = t[0]
    if kind == T.KIND_IRI:
        return rdflib.URIRef(t[1])
    if kind == T.KIND_BNODE:
        return rdflib.BNode(t[1])
    if kind == T.KIND_LITERAL:
        lex, lang, dt = t[1], t[2], t[3]
        return rdflib.Literal(
            lex, lang=lang, datatype=rdflib.URIRef(dt) if dt else None
        )
    raise TypeError(f"unsupported term kind for rdflib: {t!r}")


def _graph_term(ctx_id: Any, default_id: Any) -> tuple:
    if ctx_id == default_id:
        return T.DEFAULT_GRAPH
    return _to_term(ctx_id)


class JellySerializer(_RdflibSerializer):
    """rdflib Serializer plugin (format name: "jelly")."""

    def serialize(
        self,
        stream: IO[bytes],
        base: str | None = None,
        encoding: str | None = None,
        **kwargs: Any,
    ) -> None:
        if not HAVE_RDFLIB:  # pragma: no cover
            raise ImportError("rdflib is not installed")
        options: StreamOptions | None = kwargs.get("options")
        store = self.store
        context_aware = getattr(store, "context_aware", False)
        if context_aware and hasattr(store, "contexts"):
            default_id = getattr(
                rdflib.graph, "DATASET_DEFAULT_GRAPH_ID", rdflib.URIRef("urn:x-rdflib:default")
            )
            opts = options or StreamOptions(
                physical_type=PHYSICAL_QUADS, logical_type=LOGICAL_FLAT_QUADS
            )

            def quads():
                for ctx in store.contexts():
                    g = _graph_term(ctx.identifier, default_id)
                    for s, p, o in ctx:
                        yield (_to_term(s), _to_term(p), _to_term(o), g)

            for chunk in encode_flat(quads(), opts):
                stream.write(chunk)
            return
        opts = options or StreamOptions(
            physical_type=PHYSICAL_TRIPLES, logical_type=LOGICAL_FLAT_TRIPLES
        )

        def triples():
            for s, p, o in store:
                yield (_to_term(s), _to_term(p), _to_term(o))

        for chunk in encode_flat(triples(), opts):
            stream.write(chunk)


class JellyParser(_RdflibParser):
    """rdflib Parser plugin (format name: "jelly")."""

    def parse(self, source: Any, sink: Any, **kwargs: Any) -> None:
        if not HAVE_RDFLIB:  # pragma: no cover
            raise ImportError("rdflib is not installed")
        data = source.getByteStream().read()
        graph_sink = sink
        context_aware = getattr(sink, "context_aware", False)
        for stmt in decode_flat(data):
            s, p, o = (_from_term(stmt[0]), _from_term(stmt[1]), _from_term(stmt[2]))
            if len(stmt) == 4 and context_aware:
                g = stmt[3]
                if g[0] == T.KIND_DEFAULT:
                    graph_sink.add((s, p, o))
                else:
                    sink.get_context(_from_term(g)).add((s, p, o))
            else:
                graph_sink.add((s, p, o))


def register() -> None:
    """Register the Jelly format with rdflib's plugin system.

    After calling, ``format="jelly"`` (and the Jelly content type) works
    with ``Graph.parse`` / ``Graph.serialize``.  Mirrors the reference's
    entry-point registration (pyproject.toml:111-117), done explicitly
    here because this package ships no rdflib dependency.
    """
    if not HAVE_RDFLIB:
        raise ImportError(
            "rdflib is not installed in this environment; use the CLI "
            "(python -m pyjelly_ray.cli to-jelly / from-jelly) instead"
        )
    from rdflib import plugin
    from rdflib.parser import Parser
    from rdflib.serializer import Serializer

    mod = "pyjelly_ray.integrations.rdflib_plugin"
    for name in (JELLY_EXTENSION, JELLY_CONTENT_TYPE):
        plugin.register(name, Serializer, mod, "JellySerializer")
        plugin.register(name, Parser, mod, "JellyParser")
