"""Jelly RDF binary protocol codec (pure Python, wire-level, Ray-friendly).

Public surface:
- options: StreamOptions, LookupPreset, physical/logical type constants
- encode: StreamEncoder, encode_flat, split_iri
- decode: StreamDecoder, decode_flat, parse_options, delimited_hint
"""

from .decode import (
    StreamDecoder,
    decode_flat,
    delimited_hint,
    parse_options,
    split_delimited_frames,
)
from .encode import StreamEncoder, encode_flat, encode_grouped, split_iri
from .options import (
    DEFAULT_FRAME_SIZE,
    LOGICAL_DATASETS,
    LOGICAL_FLAT_QUADS,
    LOGICAL_FLAT_TRIPLES,
    LOGICAL_GRAPHS,
    PHYSICAL_GRAPHS,
    PHYSICAL_QUADS,
    PHYSICAL_TRIPLES,
    JellyConformanceError,
    JellyError,
    LookupPreset,
    StreamOptions,
)

__all__ = [
    "StreamDecoder",
    "StreamEncoder",
    "decode_flat",
    "encode_flat",
    "encode_grouped",
    "delimited_hint",
    "split_delimited_frames",
    "parse_options",
    "split_iri",
    "StreamOptions",
    "LookupPreset",
    "JellyError",
    "JellyConformanceError",
    "DEFAULT_FRAME_SIZE",
    "PHYSICAL_TRIPLES",
    "PHYSICAL_QUADS",
    "PHYSICAL_GRAPHS",
    "LOGICAL_FLAT_TRIPLES",
    "LOGICAL_FLAT_QUADS",
    "LOGICAL_GRAPHS",
    "LOGICAL_DATASETS",
]
