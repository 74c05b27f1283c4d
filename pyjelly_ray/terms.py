"""RDF term representation used throughout the engine.

Terms are plain tuples — cheap to hash, compare, and ship through Arrow:

    (KIND_IRI,     iri_string,  None, None)
    (KIND_BNODE,   identifier,  None, None)
    (KIND_LITERAL, lex,         lang_or_None, datatype_or_None)
    (KIND_DEFAULT, None,        None, None)
    (KIND_QUOTED,  (s, p, o),   None, None)      # RDF-star quoted triple

A statement is a tuple of 3 (triple) or 4 (quad) terms.  The columnar
(Arrow) layout used by Datasets flattens these into per-slot kind/value
columns — see :mod:`pyjelly_ray.schema`.

Kind codes are also stored in Arrow ``*_kind`` columns; keep them stable.

Interop helpers convert to/from pyjelly's generic-sink objects
(/root/reference/pyjelly/integrations/generic/generic_sink.py:8-131) for
round-trip oracle tests only — the engine itself never creates those objects.
"""

from __future__ import annotations

KIND_IRI = 1
KIND_BNODE = 2
KIND_LITERAL = 3
KIND_DEFAULT = 4
KIND_QUOTED = 5

Term = tuple  # (kind, a, b, c)


def iri(value: str) -> Term:
    return (KIND_IRI, value, None, None)


def bnode(value: str) -> Term:
    return (KIND_BNODE, value, None, None)


def literal(lex: str, lang: str | None = None, datatype: str | None = None) -> Term:
    return (KIND_LITERAL, lex, lang, datatype)


DEFAULT_GRAPH: Term = (KIND_DEFAULT, None, None, None)


def quoted(s: Term, p: Term, o: Term) -> Term:
    return (KIND_QUOTED, (s, p, o), None, None)
