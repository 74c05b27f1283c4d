"""Helpers to convert between our term tuples and pyjelly generic objects.

Used ONLY in tests — the engine never builds pyjelly objects.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")

from pyjelly.integrations.generic.generic_sink import (  # noqa: E402
    IRI,
    BlankNode,
    DefaultGraph,
    Literal,
    Quad,
    Triple,
)

from pyjelly_ray.terms import (  # noqa: E402
    DEFAULT_GRAPH,
    KIND_BNODE,
    KIND_DEFAULT,
    KIND_IRI,
    KIND_LITERAL,
    KIND_QUOTED,
)


def to_generic_term(term):
    kind = term[0]
    if kind == KIND_IRI:
        return IRI(term[1])
    if kind == KIND_BNODE:
        return BlankNode(term[1])
    if kind == KIND_LITERAL:
        return Literal(term[1], langtag=term[2], datatype=term[3])
    if kind == KIND_DEFAULT:
        return DefaultGraph
    if kind == KIND_QUOTED:
        s, p, o = term[1]
        return Triple(to_generic_term(s), to_generic_term(p), to_generic_term(o))
    raise ValueError(f"unknown kind {kind}")


def to_generic_statement(stmt):
    terms = [to_generic_term(t) for t in stmt]
    if len(stmt) == 3:
        return Triple(*terms)
    return Quad(*terms)


def from_generic_term(obj):
    if isinstance(obj, IRI):
        return (KIND_IRI, obj._iri, None, None)
    if isinstance(obj, BlankNode):
        return (KIND_BNODE, obj._identifier, None, None)
    if isinstance(obj, Literal):
        return (KIND_LITERAL, obj._lex, obj._langtag or None, obj._datatype or None)
    if obj is DefaultGraph or isinstance(obj, type(DefaultGraph)):
        return DEFAULT_GRAPH
    if isinstance(obj, Triple):
        return (
            KIND_QUOTED,
            tuple(from_generic_term(t) for t in obj),
            None,
            None,
        )
    raise ValueError(f"unknown generic term {obj!r}")


def from_generic_statement(stmt):
    return tuple(from_generic_term(t) for t in stmt)
