"""Jelly stream encoder: term tuples → delimited protobuf frames.

This is an order-dependent *fold*: three LRU lookup tables + four
repeated-term slots + a row buffer.  It must therefore run sequentially over
one output shard — in the Ray engine every output `.jelly` shard gets a fresh
:class:`StreamEncoder` inside a single write task (see
``pyjelly_ray.sinks.jelly_sink``), which is exactly the parallelism model the
format supports (each delimited stream is independent).

Wire behaviour matches the reference implementation byte-for-byte
(behavioural spec: /root/reference/pyjelly/serialize/encode.py:56-340,
streams.py:43-281, flows.py:110-121; verified by cross round-trip tests
against pyjelly in tests/test_jelly_interop.py).  Bytes are emitted directly
via :mod:`pyjelly_ray.jelly.wire` — no protobuf objects in the hot path.
"""

from __future__ import annotations

from typing import Iterable

from ..terms import KIND_BNODE, KIND_DEFAULT, KIND_IRI, KIND_LITERAL, KIND_QUOTED
from .lookup import EncoderLookup
from .options import (
    PHYSICAL_GRAPHS,
    PHYSICAL_QUADS,
    PHYSICAL_TRIPLES,
    STRING_DATATYPE_IRI,
    JellyConformanceError,
    StreamOptions,
)
from .wire import (
    append_tag_len,
    append_tag_str,
    append_tag_varint,
    append_varint,
    encode_varint,
)

# RdfStreamRow oneof field numbers (public protocol schema)
ROW_OPTIONS = 1
ROW_TRIPLE = 2
ROW_QUAD = 3
ROW_GRAPH_START = 4
ROW_GRAPH_END = 5
ROW_NAMESPACE = 6
ROW_NAME = 9
ROW_PREFIX = 10
ROW_DATATYPE = 11

# statement slot base field numbers: slot base + offset(kind)
# subject=0, predicate=4, object=8, graph(quad)=12; offsets: iri=1 bnode=2
# literal=3 triple_term=4;  quad graph: iri=13 bnode=14 default=15 literal=16
_SLOT_S = 0
_SLOT_P = 4
_SLOT_O = 8
_SLOT_G = 12


def split_iri(iri_string: str) -> tuple[str, str]:
    """Split an IRI at the rightmost ``#``, else rightmost ``/``.

    Returns (prefix incl. separator, local name); prefix may be "".
    Protocol rule per reference serialize/encode.py:14-31.
    """
    hash_pos = iri_string.rfind("#")
    if hash_pos != -1:
        return iri_string[: hash_pos + 1], iri_string[hash_pos + 1 :]
    slash_pos = iri_string.rfind("/")
    if slash_pos != -1:
        return iri_string[: slash_pos + 1], iri_string[slash_pos + 1 :]
    return "", iri_string


def _encode_options_row(opts: StreamOptions) -> bytes:
    body = bytearray()
    if opts.stream_name:
        append_tag_str(body, 1, opts.stream_name)
    if opts.physical_type:
        append_tag_varint(body, 2, opts.physical_type)
    if opts.generalized_statements:
        append_tag_varint(body, 3, 1)
    if opts.rdf_star:
        append_tag_varint(body, 4, 1)
    lp = opts.lookup_preset
    if lp.max_names:
        append_tag_varint(body, 9, lp.max_names)
    if lp.max_prefixes:
        append_tag_varint(body, 10, lp.max_prefixes)
    if lp.max_datatypes:
        append_tag_varint(body, 11, lp.max_datatypes)
    if opts.logical_type:
        append_tag_varint(body, 14, opts.logical_type)
    if opts.version:
        append_tag_varint(body, 15, opts.version)
    row = bytearray()
    append_tag_len(row, ROW_OPTIONS, bytes(body))
    return bytes(row)


class StreamEncoder:
    """Sequential encoder for ONE Jelly stream (one output shard/file)."""

    def __init__(self, options: StreamOptions | None = None) -> None:
        self.options = options or StreamOptions()
        lp = self.options.lookup_preset
        self.names = EncoderLookup(lp.max_names)
        self.prefixes = EncoderLookup(lp.max_prefixes)
        self.datatypes = EncoderLookup(lp.max_datatypes)
        # last term per slot (s, p, o, g) for repeated-term suppression
        self._repeat: list[object | None] = [None, None, None, None]
        self._rows: list[bytes] = []
        self._row_count = 0
        self._enrolled = False
        #: optional per-frame metadata source for the BOUNDED (auto-cut) path:
        #: called with the 0-based frame index at every cut; returns the
        #: map<string,bytes> for that frame (or None).  Extension beyond the
        #: reference (parse-only there: integrations/rdflib/parse.py:283-287);
        #: used for per-frame lineage (shard id, frame seq) at scale.
        self.metadata_fn = None
        self._frame_index = 0

    # -- row buffer / framing ------------------------------------------------

    def _enroll(self) -> None:
        if not self._enrolled:
            self._rows.append(_encode_options_row(self.options))
            self._row_count += 1
            self._enrolled = True

    def _frame_bytes(self, metadata: dict[str, bytes] | None = None) -> bytes:
        """Serialize and clear buffered rows as one RdfStreamFrame.

        ``metadata`` fills the frame's map<string,bytes> field (field 15):
        each entry is a submessage {key=1: string, value=2: bytes}.
        """
        payload = bytearray()
        for row in self._rows:
            append_tag_len(payload, 1, row)
        if metadata:
            for key in sorted(metadata):  # deterministic map order
                entry = bytearray()
                append_tag_str(entry, 1, key)
                append_tag_len(entry, 2, metadata[key])
                append_tag_len(payload, 15, bytes(entry))
        self._rows.clear()
        self._row_count = 0
        return bytes(payload)

    def _next_metadata(self) -> dict[str, bytes] | None:
        fn = self.metadata_fn
        md = fn(self._frame_index) if fn is not None else None
        self._frame_index += 1
        return md

    def _maybe_cut(self) -> bytes | None:
        """Emit a delimited frame when the row budget is reached (flat flows)."""
        if (
            self.options.delimited
            and self.options.flat
            and self._row_count >= self.options.frame_size
        ):
            frame = self._frame_bytes(self._next_metadata())
            return encode_varint(len(frame)) + frame
        return None

    def flush(self) -> bytes | None:
        """Emit any buffered rows as a final frame.

        Returns delimited bytes (varint length prefix + frame), or the bare
        frame when the stream is non-delimited, or None if nothing buffered.
        """
        self._enroll()  # even an empty stream declares its options
        if not self._rows:
            return None
        frame = self._frame_bytes(self._next_metadata())
        if self.options.delimited:
            return encode_varint(len(frame)) + frame
        return frame

    def cut_frame(self, metadata: dict[str, bytes] | None = None) -> bytes | None:
        """Manually cut a frame (grouped flows: one frame per graph/dataset).

        Optional ``metadata`` is attached to this frame (reference exposes
        it via a ContextVar on parse; we return it from iter_frames).  When
        omitted, ``metadata_fn`` (if set) supplies it.
        """
        if not self._rows:
            return None
        frame = self._frame_bytes(
            metadata if metadata is not None else self._next_metadata()
        )
        if metadata is not None:
            self._frame_index += 1
        if self.options.delimited:
            return encode_varint(len(frame)) + frame
        return frame

    # -- term encoding -------------------------------------------------------

    def _encode_iri_value(self, iri_string: str) -> bytes:
        """Lookup-encode an IRI; entry rows appended; returns RdfIri bytes."""
        rows = self._rows
        if self.prefixes.max_size:
            prefix, name = split_iri(iri_string)
            prefix_entry = self.prefixes.entry_id(prefix)
            if prefix_entry is not None:
                entry = bytearray()
                if prefix_entry:
                    append_tag_varint(entry, 1, prefix_entry)
                if prefix:
                    append_tag_str(entry, 2, prefix)
                row = bytearray()
                append_tag_len(row, ROW_PREFIX, bytes(entry))
                rows.append(bytes(row))
        else:
            prefix, name = "", iri_string
        name_entry = self.names.entry_id(name)
        if name_entry is not None:
            entry = bytearray()
            if name_entry:
                append_tag_varint(entry, 1, name_entry)
            if name:
                append_tag_str(entry, 2, name)
            row = bytearray()
            append_tag_len(row, ROW_NAME, bytes(entry))
            rows.append(bytes(row))
        prefix_id = self.prefixes.prefix_ref(prefix)
        name_id = self.names.name_ref(name)
        iri_body = bytearray()
        if prefix_id:
            append_tag_varint(iri_body, 1, prefix_id)
        if name_id:
            append_tag_varint(iri_body, 2, name_id)
        return bytes(iri_body)

    def _encode_literal_value(
        self, lex: str, lang: str | None, datatype: str | None
    ) -> bytes:
        """Encode a literal; datatype entry rows appended; returns RdfLiteral bytes."""
        datatype_id = 0
        if datatype and datatype != STRING_DATATYPE_IRI:
            if self.datatypes.max_size == 0:
                raise JellyConformanceError(
                    f"can't encode literal with type {datatype}: datatype lookup disabled"
                )
            dt_entry = self.datatypes.entry_id(datatype)
            if dt_entry is not None:
                entry = bytearray()
                if dt_entry:
                    append_tag_varint(entry, 1, dt_entry)
                append_tag_str(entry, 2, datatype)
                row = bytearray()
                append_tag_len(row, ROW_DATATYPE, bytes(entry))
                self._rows.append(bytes(row))
            datatype_id = self.datatypes.datatype_ref(datatype)
        body = bytearray()
        if lex:
            append_tag_str(body, 1, lex)
        if lang:
            append_tag_str(body, 2, lang)
        if datatype_id:
            append_tag_varint(body, 3, datatype_id)
        return bytes(body)

    def _encode_term_into(self, buf: bytearray, slot_base: int, term: tuple) -> None:
        """Append one statement-slot field for ``term`` (entries emitted first)."""
        kind = term[0]
        if kind == KIND_IRI:
            append_tag_len(buf, slot_base + 1, self._encode_iri_value(term[1]))
        elif kind == KIND_BNODE:
            append_tag_str(buf, slot_base + 2, term[1])
        elif kind == KIND_LITERAL:
            append_tag_len(
                buf, slot_base + 3, self._encode_literal_value(term[1], term[2], term[3])
            )
        elif kind == KIND_QUOTED:
            append_tag_len(buf, slot_base + 4, self._encode_quoted(term[1]))
        else:
            raise JellyConformanceError(f"term kind {kind} not valid in s/p/o slot")

    def _encode_quoted(self, spo: tuple) -> bytes:
        """RDF-star quoted triple: all three slots set, no repeat suppression."""
        body = bytearray()
        self._encode_term_into(body, _SLOT_S, spo[0])
        self._encode_term_into(body, _SLOT_P, spo[1])
        self._encode_term_into(body, _SLOT_O, spo[2])
        return bytes(body)

    def _encode_graph_into(self, buf: bytearray, base: int, term: tuple) -> None:
        """Graph slot: fields base+1..base+4 = iri/bnode/default/literal."""
        kind = term[0]
        if kind == KIND_IRI:
            append_tag_len(buf, base + 1, self._encode_iri_value(term[1]))
        elif kind == KIND_BNODE:
            append_tag_str(buf, base + 2, term[1])
        elif kind == KIND_DEFAULT:
            append_tag_len(buf, base + 3, b"")
        elif kind == KIND_LITERAL:
            append_tag_len(
                buf, base + 4, self._encode_literal_value(term[1], term[2], term[3])
            )
        else:
            raise JellyConformanceError(f"term kind {kind} not valid in graph slot")

    # -- statements ----------------------------------------------------------

    def triple(self, s: tuple, p: tuple, o: tuple) -> bytes | None:
        """Encode one triple; returns delimited frame bytes when one is cut."""
        self._enroll()
        repeat = self._repeat
        body = bytearray()
        if repeat[0] != s:
            self._encode_term_into(body, _SLOT_S, s)
            repeat[0] = s
        if repeat[1] != p:
            self._encode_term_into(body, _SLOT_P, p)
            repeat[1] = p
        if repeat[2] != o:
            self._encode_term_into(body, _SLOT_O, o)
            repeat[2] = o
        row = bytearray()
        append_tag_len(row, ROW_TRIPLE, bytes(body))
        self._rows.append(bytes(row))
        self._row_count = len(self._rows)
        return self._maybe_cut()

    def quad(self, s: tuple, p: tuple, o: tuple, g: tuple) -> bytes | None:
        self._enroll()
        repeat = self._repeat
        body = bytearray()
        if repeat[0] != s:
            self._encode_term_into(body, _SLOT_S, s)
            repeat[0] = s
        if repeat[1] != p:
            self._encode_term_into(body, _SLOT_P, p)
            repeat[1] = p
        if repeat[2] != o:
            self._encode_term_into(body, _SLOT_O, o)
            repeat[2] = o
        if repeat[3] != g:
            self._encode_graph_into(body, _SLOT_G, g)
            repeat[3] = g
        row = bytearray()
        append_tag_len(row, ROW_QUAD, bytes(body))
        self._rows.append(bytes(row))
        self._row_count = len(self._rows)
        return self._maybe_cut()

    def graph_start(self, g: tuple) -> None:
        """Physical GRAPHS: emit a graph-start marker row."""
        self._enroll()
        body = bytearray()
        self._encode_graph_into(body, 0, g)
        row = bytearray()
        append_tag_len(row, ROW_GRAPH_START, bytes(body))
        self._rows.append(bytes(row))
        self._row_count = len(self._rows)

    def graph_end(self) -> bytes | None:
        row = bytearray()
        append_tag_len(row, ROW_GRAPH_END, b"")
        self._rows.append(bytes(row))
        self._row_count = len(self._rows)
        return self._maybe_cut()

    def namespace_declaration(self, name: str, iri_value: str) -> None:
        """Emit a namespace (prefix binding) row; uses the IRI lookups."""
        self._enroll()
        iri_bytes = self._encode_iri_value(iri_value)
        body = bytearray()
        if name:
            append_tag_str(body, 1, name)
        append_tag_len(body, 2, iri_bytes)
        row = bytearray()
        append_tag_len(row, ROW_NAMESPACE, bytes(body))
        self._rows.append(bytes(row))
        self._row_count = len(self._rows)


def encode_flat(
    statements: Iterable[tuple],
    options: StreamOptions | None = None,
) -> Iterable[bytes]:
    """Encode an iterable of statement tuples into delimited frame chunks.

    Statement tuples of length 3 are triples, length 4 quads.  The physical
    type is taken from ``options`` (default TRIPLES).
    """
    enc = StreamEncoder(options)
    quads = enc.options.physical_type == PHYSICAL_QUADS
    graphs = enc.options.physical_type == PHYSICAL_GRAPHS
    _unset = object()
    cur_g: object = _unset
    for stmt in statements:
        if graphs:
            # GRAPHS physical carries graph_start/triple…/graph_end marker
            # rows (quad rows are nonconformant in this physical type)
            g = stmt[3] if len(stmt) == 4 else (KIND_DEFAULT, None, None, None)
            if cur_g is _unset or g != cur_g:
                if cur_g is not _unset:
                    out = enc.graph_end()
                    if out:
                        yield out
                enc.graph_start(g)
                cur_g = g
            out = enc.triple(stmt[0], stmt[1], stmt[2])
        elif quads:
            out = enc.quad(stmt[0], stmt[1], stmt[2], stmt[3])
        else:
            out = enc.triple(stmt[0], stmt[1], stmt[2])
        if out:
            yield out
    if graphs and cur_g is not _unset:
        out = enc.graph_end()
        if out:
            yield out
    tail = enc.flush()
    if tail:
        yield tail


def encode_grouped(
    groups: Iterable[Iterable[tuple]],
    options: StreamOptions | None = None,
    metadata_fn=None,
) -> Iterable[bytes]:
    """Encode statement GROUPS as one delimited frame per group.

    The writer-side helper for the grouped logical types (GRAPHS, DATASETS,
    SUBJECT_GRAPHS, NAMED_GRAPHS — reference flows.py:132-159 cuts one frame
    per graph/dataset; parse side reconstructs one container per frame).
    Lookup state persists ACROSS groups (one stream), only framing follows
    the groups.  ``metadata_fn(group_index)`` optionally attaches per-frame
    metadata.
    """
    from .options import LOGICAL_GRAPHS

    options = options or StreamOptions(logical_type=LOGICAL_GRAPHS)
    if options.flat:
        raise JellyConformanceError("encode_grouped requires a grouped logical type")
    enc = StreamEncoder(options)
    quads = options.physical_type == PHYSICAL_QUADS
    graphs = options.physical_type == PHYSICAL_GRAPHS
    _unset = object()
    for gi, group in enumerate(groups):
        cur_g: object = _unset
        for stmt in group:
            if graphs:
                # GRAPHS physical: graph_start/triple…/graph_end marker rows
                # (a quad row would be nonconformant in this physical type);
                # 3-tuples land in the default graph
                g = stmt[3] if len(stmt) == 4 else (KIND_DEFAULT, None, None, None)
                if cur_g is _unset or g != cur_g:
                    if cur_g is not _unset:
                        enc.graph_end()
                    enc.graph_start(g)
                    cur_g = g
                enc.triple(stmt[0], stmt[1], stmt[2])
            elif quads:
                enc.quad(stmt[0], stmt[1], stmt[2], stmt[3])
            else:
                enc.triple(stmt[0], stmt[1], stmt[2])
        if graphs and cur_g is not _unset:
            enc.graph_end()
        frame = enc.cut_frame(metadata_fn(gi) if metadata_fn is not None else None)
        if frame:
            yield frame


__all__ = [
    "StreamEncoder",
    "split_iri",
    "encode_flat",
    "encode_grouped",
    "PHYSICAL_TRIPLES",
    "PHYSICAL_QUADS",
    "PHYSICAL_GRAPHS",
]
