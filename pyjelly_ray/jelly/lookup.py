"""Jelly lookup-table compression: LRU string dictionaries + delta encoding.

These implement the protocol's stateful compression semantics (behavioural
parity targets — NOT code — in the reference:
/root/reference/pyjelly/serialize/lookup.py:12-137 encoder side,
/root/reference/pyjelly/parse/lookup.py:11-70 decoder side):

Encoder rules
- Indices are 1-based; index 0 is reserved for delta encoding.
- Until the table is full, inserts assign ``len + 1``.  Once full, the
  least-recently-used entry is evicted and *its index is reused* — this is the
  subtle bit: the id sequence is no longer monotonic after the first eviction.
- Entry rows (dictionary updates streamed inline): the emitted id is 0 when
  the assigned index equals ``last_assigned + 1``, else the literal index.
- Name term refs: emitted id is 0 when the index equals ``last_reused + 1``.
- Prefix term refs: emitted id is 0 when it equals the last prefix ref (or
  when the prefix is empty and no prefix was ever referenced).
- Datatype term refs are never delta-encoded.

Decoder rules are the mirror image, implemented over a flat list (ring of
slots) rather than an OrderedDict since the decoder never evicts by recency —
the encoder tells it exactly which slot to overwrite.
"""

from __future__ import annotations

from collections import OrderedDict

from .options import MAX_LOOKUP_SIZE, JellyError


class EncoderLookup:
    """One LRU string→index dictionary with delta-encoding helpers.

    ``ref_id(value)`` / ``entry_for(value)`` are split so the caller can emit
    the entry row before computing the term reference, matching the wire
    order (entries precede the statement row that uses them).
    """

    __slots__ = ("data", "max_size", "_full", "last_assigned", "last_reused")

    def __init__(self, max_size: int) -> None:
        self.data: OrderedDict[str, int] = OrderedDict()
        self.max_size = max_size
        self._full = False
        self.last_assigned = 0
        self.last_reused = 0

    def entry_id(self, value: str) -> int | None:
        """Get-or-insert ``value``; return the *wire* entry id to emit.

        Returns ``None`` if the value was already present (no entry row
        needed), ``0`` if the assigned index is sequential, else the index.
        Also refreshes recency on hit.
        """
        data = self.data
        if value in data:
            data.move_to_end(value)
            return None
        if not self.max_size:
            raise JellyError("lookup disabled (size 0), cannot insert")
        if self._full:
            _, index = data.popitem(last=False)
            data[value] = index
        else:
            index = len(data) + 1
            data[value] = index
            if index == self.max_size:
                self._full = True
        previous = self.last_assigned
        self.last_assigned = index
        return 0 if index == previous + 1 else index

    def _use(self, value: str) -> int:
        """Touch ``value`` and return its current index (sets last_reused)."""
        data = self.data
        data.move_to_end(value)
        index = data[value]
        self.last_reused = index
        return index

    def name_ref(self, value: str) -> int:
        previous = self.last_reused
        index = self._use(value)
        return 0 if index == previous + 1 else index

    def prefix_ref(self, value: str) -> int:
        if self.max_size == 0:
            return 0
        previous = self.last_reused
        if not value and previous == 0:
            return 0
        index = self._use(value)
        if previous == 0:
            return index
        return 0 if index == previous else index

    def datatype_ref(self, value: str) -> int:
        if self.max_size == 0:
            return 0
        return self._use(value)


class DecoderLookup:
    """Decoder-side table: slot array + the mirror delta rules."""

    __slots__ = ("data", "max_size", "last_assigned", "last_reused")

    def __init__(self, max_size: int) -> None:
        if max_size > MAX_LOOKUP_SIZE:
            raise JellyError(f"lookup size cannot exceed {MAX_LOOKUP_SIZE}")
        self.max_size = max_size
        self.data: list[str | None] = [None] * max_size
        self.last_assigned = 0
        self.last_reused = 0

    def assign(self, index: int, value: str) -> None:
        if index == 0:
            index = self.last_assigned + 1
        if index <= 0 or index > self.max_size:
            raise JellyError(f"entry index {index} out of range 1..{self.max_size}")
        self.data[index - 1] = value
        self.last_assigned = index

    def _at(self, index: int) -> str:
        self.last_reused = index
        value = self.data[index - 1]
        if value is None:
            raise JellyError(f"reference to unset lookup index {index}")
        return value

    def name_ref(self, index: int) -> str:
        actual = index or self.last_reused + 1
        if actual == 0:
            raise JellyError("0 is not a valid name term index")
        return self._at(actual)

    def prefix_ref(self, index: int) -> str:
        actual = index or self.last_reused
        if actual == 0:
            return ""
        return self._at(actual)

    def datatype_ref(self, index: int) -> str:
        if index == 0:
            raise JellyError("0 is not a valid datatype term index")
        return self._at(index)
