"""Jelly stream options: physical/logical types, lookup presets, parameters.

Semantics mirror the public Jelly protocol as implemented by the reference
(pyjelly): defaults and bounds per /root/reference/pyjelly/options.py:17-25,
type-compatibility matrix per /root/reference/pyjelly/options.py:126-141.
The code is original; only the protocol constants are shared.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- physical stream types (protocol enum) ---
PHYSICAL_UNSPECIFIED = 0
PHYSICAL_TRIPLES = 1
PHYSICAL_QUADS = 2
PHYSICAL_GRAPHS = 3

# --- logical stream types (RDF-STaX; protocol enum) ---
LOGICAL_UNSPECIFIED = 0
LOGICAL_FLAT_TRIPLES = 1
LOGICAL_FLAT_QUADS = 2
LOGICAL_GRAPHS = 3
LOGICAL_DATASETS = 4
LOGICAL_SUBJECT_GRAPHS = 13
LOGICAL_NAMED_GRAPHS = 14
LOGICAL_TIMESTAMPED_NAMED_GRAPHS = 114

MIN_NAME_LOOKUP_SIZE = 8
MAX_LOOKUP_SIZE = 4096
MIN_VERSION = 1
MAX_VERSION = 2

DEFAULT_NAME_LOOKUP_SIZE = 4000
DEFAULT_PREFIX_LOOKUP_SIZE = 150
DEFAULT_DATATYPE_LOOKUP_SIZE = 32

DEFAULT_FRAME_SIZE = 250  # rows per delimited frame (reference flows.py:11)

STRING_DATATYPE_IRI = "http://www.w3.org/2001/XMLSchema#string"

#: logical types only compatible with physical TRIPLES
_TRIPLES_ONLY_LOGICAL = {LOGICAL_GRAPHS, LOGICAL_SUBJECT_GRAPHS, LOGICAL_FLAT_TRIPLES}


class JellyError(Exception):
    """Base error for Jelly codec failures."""


class JellyConformanceError(JellyError):
    """Stream violates Jelly protocol conformance rules."""


@dataclass(frozen=True)
class LookupPreset:
    """Capacities of the three inline compression dictionaries."""

    max_names: int = DEFAULT_NAME_LOOKUP_SIZE
    max_prefixes: int = DEFAULT_PREFIX_LOOKUP_SIZE
    max_datatypes: int = DEFAULT_DATATYPE_LOOKUP_SIZE

    def __post_init__(self) -> None:
        if self.max_names < MIN_NAME_LOOKUP_SIZE:
            raise JellyConformanceError("name lookup size must be at least 8")
        for v in (self.max_names, self.max_prefixes, self.max_datatypes):
            if v > MAX_LOOKUP_SIZE:
                raise JellyConformanceError(
                    f"lookup size cannot exceed {MAX_LOOKUP_SIZE}"
                )

    @classmethod
    def small(cls) -> "LookupPreset":
        return cls(max_names=128, max_prefixes=32, max_datatypes=32)

    @classmethod
    def tiny(cls) -> "LookupPreset":
        return cls(max_names=16, max_prefixes=8, max_datatypes=32)

    @classmethod
    def no_prefixes(cls) -> "LookupPreset":
        return cls(max_prefixes=0)


def validate_type_compatibility(physical_type: int, logical_type: int) -> None:
    """Enforce the physical/logical compatibility matrix."""
    if physical_type == PHYSICAL_UNSPECIFIED or logical_type == LOGICAL_UNSPECIFIED:
        return
    is_triples_physical = physical_type == PHYSICAL_TRIPLES
    is_triples_logical = logical_type in _TRIPLES_ONLY_LOGICAL
    if is_triples_physical != is_triples_logical:
        raise JellyError(
            f"physical type {physical_type} incompatible with logical {logical_type}"
        )


@dataclass(frozen=True)
class StreamOptions:
    """Everything declared by the in-band options row + framing knobs."""

    physical_type: int = PHYSICAL_TRIPLES
    logical_type: int = LOGICAL_FLAT_TRIPLES
    lookup_preset: LookupPreset = field(default_factory=LookupPreset)
    stream_name: str = ""
    generalized_statements: bool = False
    rdf_star: bool = False
    namespace_declarations: bool = False
    delimited: bool = True
    frame_size: int = DEFAULT_FRAME_SIZE

    def __post_init__(self) -> None:
        validate_type_compatibility(self.physical_type, self.logical_type)

    @property
    def version(self) -> int:
        return MAX_VERSION if self.namespace_declarations else MIN_VERSION

    @property
    def flat(self) -> bool:
        return self.logical_type in (LOGICAL_FLAT_TRIPLES, LOGICAL_FLAT_QUADS)
