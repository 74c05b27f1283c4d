"""rdflib plugin tests — run only where rdflib is installed.

The container this repo develops in has no rdflib (SURVEY §0), so these
skip there; the module itself must still import cleanly and refuse
`register()` with a clear error (tested unconditionally below).
"""

from __future__ import annotations

import io

import pytest

from pyjelly_ray.integrations import rdflib_plugin as rp


def test_module_importable_and_gated_without_rdflib():
    if rp.HAVE_RDFLIB:
        pytest.skip("rdflib present; gating path not applicable")
    with pytest.raises(ImportError):
        rp.register()


needs_rdflib = pytest.mark.skipif(not rp.HAVE_RDFLIB, reason="rdflib not installed")
if rp.HAVE_RDFLIB:
    import rdflib


@pytest.fixture(scope="module")
def _registered():
    rp.register()


def _sample_graph():
    g = rdflib.Graph()
    ex = rdflib.Namespace("https://ex.org/")
    g.add((ex.s1, ex.p, ex.o1))
    g.add((ex.s1, ex.p, rdflib.Literal("hello", lang="en")))
    g.add((ex.s2, ex.p, rdflib.Literal("42", datatype=rdflib.XSD.integer)))
    g.add((rdflib.BNode("b0"), ex.p, ex.o1))
    return g


@needs_rdflib
def test_rdflib_roundtrip_triples(_registered):
    g = _sample_graph()
    buf = io.BytesIO()
    g.serialize(buf, format="jelly")
    g2 = rdflib.Graph()
    g2.parse(io.BytesIO(buf.getvalue()), format="jelly")
    assert set(g) == set(g2)


@needs_rdflib
def test_rdflib_roundtrip_quads(_registered):
    ds = rdflib.ConjunctiveGraph()
    ex = rdflib.Namespace("https://ex.org/")
    ds.get_context(ex.g1).add((ex.s, ex.p, ex.o))
    ds.add((ex.s, ex.p, rdflib.Literal("default-graph")))
    buf = io.BytesIO()
    ds.serialize(buf, format="jelly")
    ds2 = rdflib.ConjunctiveGraph()
    ds2.parse(io.BytesIO(buf.getvalue()), format="jelly")
    assert set(ds.quads()) == set(ds2.quads())


@needs_rdflib
def test_rdflib_bytes_parse_by_reference(_registered):
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.generic_sink import GenericStatementSink

    g = _sample_graph()
    buf = io.BytesIO()
    g.serialize(buf, format="jelly")
    sink = GenericStatementSink()
    sink.parse(io.BytesIO(buf.getvalue()))
    assert len(sink) == len(g)
