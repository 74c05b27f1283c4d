"""E2E golden round-trips over the reference's OWN W3C-derived corpora.

Mirrors /root/reference/tests/e2e_tests/test_e2e.py: parse each .nt/.nq
fixture, serialize with OUR encoder across the preset grid, parse back with
BOTH our decoder and reference pyjelly, assert statement-set equality —
plus byte equality of our writer vs pyjelly's writer on the same stream.
"""

from __future__ import annotations

import glob
import io

import pytest

from pyjelly_ray.jelly import (
    LOGICAL_FLAT_QUADS,
    PHYSICAL_QUADS,
    LookupPreset,
    StreamOptions,
    decode_flat,
    encode_flat,
)
from pyjelly_ray.sources.ntriples import parse_line
from pyjelly_ray.terms import DEFAULT_GRAPH, KIND_LITERAL

NT_FILES = sorted(glob.glob("/root/reference/tests/e2e_test_cases/triples_rdf_1_1/*.nt"))
NQ_FILES = sorted(glob.glob("/root/reference/tests/e2e_test_cases/quads_rdf_1_1/*.nq"))

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

PRESETS = {
    "default": LookupPreset(),
    "small": LookupPreset.small(),
    "tiny": LookupPreset.tiny(),
    "no_prefix": LookupPreset.no_prefixes(),
}


def _load(path: str, quads: bool):
    stmts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parsed = parse_line(line)
            if parsed is None:
                continue
            if quads and len(parsed) == 3:
                parsed = (*parsed, DEFAULT_GRAPH)
            stmts.append(parsed)
    return stmts


def _norm(stmts):
    def nt(t):
        if t[0] == KIND_LITERAL and t[3] == XSD_STRING:
            return (t[0], t[1], t[2], None)
        return t

    return [tuple(nt(t) for t in s) for s in stmts]


def _options(preset, quads, frame_size=200):
    if quads:
        return StreamOptions(
            physical_type=PHYSICAL_QUADS,
            logical_type=LOGICAL_FLAT_QUADS,
            lookup_preset=preset,
            frame_size=frame_size,
            generalized_statements=True,
            rdf_star=True,
        )
    return StreamOptions(
        lookup_preset=preset, frame_size=frame_size,
        generalized_statements=True, rdf_star=True,
    )


def _pyjelly_parse(data):
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.generic_sink import GenericStatementSink

    from tests.interop import from_generic_statement

    sink = GenericStatementSink()
    sink.parse(io.BytesIO(data))
    return [from_generic_statement(s) for s in sink.store]


def _pyjelly_bytes(stmts, preset, quads, frame_size=200):
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly import jelly as rj
    from pyjelly.integrations.generic.serialize import flat_stream_to_file
    from pyjelly.options import LookupPreset as RefPreset
    from pyjelly.options import StreamParameters
    from pyjelly.serialize.streams import SerializerOptions

    from tests.interop import to_generic_statement

    opts = SerializerOptions(
        logical_type=(
            rj.LOGICAL_STREAM_TYPE_FLAT_QUADS if quads else rj.LOGICAL_STREAM_TYPE_FLAT_TRIPLES
        ),
        frame_size=frame_size,
        lookup_preset=RefPreset(
            max_names=preset.max_names,
            max_prefixes=preset.max_prefixes,
            max_datatypes=preset.max_datatypes,
        ),
        params=StreamParameters(generalized_statements=True, rdf_star=True),
    )
    buf = io.BytesIO()
    flat_stream_to_file((to_generic_statement(s) for s in stmts), buf, options=opts)
    return buf.getvalue()


@pytest.mark.parametrize("path", NT_FILES, ids=[p.rsplit("/", 1)[-1] for p in NT_FILES])
@pytest.mark.parametrize("preset_name", list(PRESETS))
def test_triples_corpus_roundtrip(pyjelly_reference, path, preset_name):
    stmts = _load(path, quads=False)
    assert stmts
    preset = PRESETS[preset_name]
    ours = b"".join(encode_flat(iter(stmts), _options(preset, quads=False)))
    # byte parity with the reference writer on the identical stream
    assert ours == _pyjelly_bytes(stmts, preset, quads=False)
    expected = set(map(tuple, _norm(stmts)))
    assert set(map(tuple, decode_flat(ours))) == expected
    assert set(map(tuple, _pyjelly_parse(ours))) == expected


@pytest.mark.parametrize("path", NQ_FILES, ids=[p.rsplit("/", 1)[-1] for p in NQ_FILES])
@pytest.mark.parametrize("preset_name", ["default", "tiny"])
def test_quads_corpus_roundtrip(pyjelly_reference, path, preset_name):
    stmts = _load(path, quads=True)
    assert stmts
    preset = PRESETS[preset_name]
    ours = b"".join(encode_flat(iter(stmts), _options(preset, quads=True)))
    assert ours == _pyjelly_bytes(stmts, preset, quads=True)
    expected = set(map(tuple, _norm(stmts)))
    assert set(map(tuple, decode_flat(ours))) == expected
    assert set(map(tuple, _pyjelly_parse(ours))) == expected
