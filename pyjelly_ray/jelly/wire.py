"""Minimal protobuf wire-format primitives for the Jelly RDF protocol.

Hand-rolled (no generated code, no protobuf runtime dependency in the hot
path): Jelly messages are small and fixed, so emitting wire bytes directly is
both faster than constructing message objects and keeps the codec
self-contained.  Field numbers and types are derived from the *public* Jelly
protocol schema (the same schema pyjelly's generated descriptor encodes —
see /root/reference/pyjelly/jelly/rdf_pb2.py:27 for the reference
descriptor; semantics are specified by the Jelly protocol, not by that file).

Wire rules used (protobuf spec):
- varint: little-endian base-128, MSB = continuation.
- tag = (field_number << 3) | wire_type;  wire types: 0 = varint, 2 = LEN.
- proto3 implicit presence: scalar fields equal to their default (0 / "" /
  false) are not serialized — EXCEPT oneof members, which are serialized
  whenever the branch is set, even with a default value.
- python protobuf serializes fields in field-number order; we do the same so
  our bytes match pyjelly's byte-for-byte.
"""

from __future__ import annotations


def encode_varint(value: int) -> bytes:
    """Encode an unsigned integer as a protobuf varint."""
    if value < 0x80:
        return bytes((value,))
    out = bytearray()
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def append_varint(buf: bytearray, value: int) -> None:
    while value >= 0x80:
        buf.append((value & 0x7F) | 0x80)
        value >>= 7
    buf.append(value)


def append_tag_varint(buf: bytearray, field: int, value: int) -> None:
    """Append ``field: value`` with wire type 0 (varint).

    Fast path: tag and value both single-byte (fields ≤ 15, value < 128) —
    the overwhelmingly common case for lookup ids.
    """
    tag = field << 3
    if tag < 0x80 and value < 0x80:
        buf.append(tag)
        buf.append(value)
        return
    append_varint(buf, tag)
    append_varint(buf, value)


def append_tag_len(buf: bytearray, field: int, payload: bytes) -> None:
    """Append ``field: payload`` with wire type 2 (length-delimited).

    Fast path for single-byte tag + length (payload < 128 bytes).
    """
    tag = (field << 3) | 2
    n = len(payload)
    if tag < 0x80 and n < 0x80:
        buf.append(tag)
        buf.append(n)
        buf += payload
        return
    append_varint(buf, tag)
    append_varint(buf, n)
    buf += payload


def append_tag_str(buf: bytearray, field: int, value: str) -> None:
    append_tag_len(buf, field, value.encode("utf-8"))


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode a varint at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def iter_fields(data: bytes, start: int = 0, end: int | None = None):
    """Yield ``(field_number, wire_type, value, new_pos)`` over a message.

    For wire type 0 the value is the int; for wire type 2 it is a
    ``memoryview``-free bytes slice (start, end) tuple to avoid copies —
    callers slice ``data[s:e]`` only when needed.
    """
    if end is None:
        end = len(data)
    pos = start
    while pos < end:
        key, pos = read_varint(data, pos)
        field = key >> 3
        wtype = key & 7
        if wtype == 0:
            value, pos = read_varint(data, pos)
            yield field, 0, value, pos
        elif wtype == 2:
            length, pos = read_varint(data, pos)
            yield field, 2, (pos, pos + length), pos + length
            pos += length
        elif wtype == 5:  # 32-bit
            yield field, 5, (pos, pos + 4), pos + 4
            pos += 4
        elif wtype == 1:  # 64-bit
            yield field, 1, (pos, pos + 8), pos + 8
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wtype} at {pos}")
