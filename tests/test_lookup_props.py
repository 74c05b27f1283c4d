"""Property-based tests for the lookup compression layer (FIXTURES.md §F4).

Mirrors the reference's Hypothesis strategy
(/root/reference/tests/unit_tests/test_parse/test_lookup_decoder.py) plus
pinned delta-encoding cases from its unit suite
(test_serialize/test_lookups/test_lookup_encoder.py:30-208 semantics).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyjelly_ray.jelly.lookup import DecoderLookup, EncoderLookup


def _roundtrip(values: list[str], size: int) -> None:
    """Encode a reference stream then decode it; values must survive."""
    enc = EncoderLookup(size)
    dec = DecoderLookup(size)
    for v in values:
        entry = enc.entry_id(v)
        if entry is not None:
            dec.assign(entry, v)
        ref = enc.name_ref(v)
        assert dec.name_ref(ref) == v


@given(
    st.lists(st.text(alphabet="abcdef", min_size=0, max_size=4), min_size=1, max_size=300),
    st.integers(min_value=8, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_name_lookup_roundtrip(values, size):
    _roundtrip(values, size)


@given(
    st.lists(st.sampled_from(["", "p1", "p2", "p3", "q", "r", "s", "t", "u", "v"]), min_size=1, max_size=200),
    st.integers(min_value=2, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_prefix_lookup_roundtrip(values, size):
    enc = EncoderLookup(size)
    dec = DecoderLookup(size)
    for v in values:
        entry = enc.entry_id(v)
        if entry is not None:
            dec.assign(entry, v)
        ref = enc.prefix_ref(v)
        assert dec.prefix_ref(ref) == v


def test_entry_id_zero_means_sequential():
    """Pinned: entry id 0 ⇔ assigned index == previous + 1."""
    enc = EncoderLookup(3)
    assert enc.entry_id("a") == 0  # index 1 == 0+1
    assert enc.entry_id("b") == 0  # 2 == 1+1
    assert enc.entry_id("c") == 0  # 3 == 2+1 (table now full)
    assert enc.entry_id("a") is None  # hit, moved to end
    # evict LRU ("b" is oldest) and REUSE its index (2): not sequential (3+1=4 ≠ 2)
    assert enc.entry_id("d") == 2


def test_evict_reuse_index_changes_future_ids():
    """The LRU-evict-reuse subtlety (reference serialize/lookup.py:44-50)."""
    enc = EncoderLookup(2)
    assert enc.entry_id("x") == 0  # 1
    assert enc.entry_id("y") == 0  # 2, full
    assert enc.entry_id("z") == 1  # evicts x, reuses index 1 (prev=2 → not seq)
    assert enc.entry_id("w") == 0  # evicts y, reuses index 2 == prev(1)+1 → 0


def test_name_ref_delta():
    enc = EncoderLookup(8)
    enc.entry_id("a")
    enc.entry_id("b")
    assert enc.name_ref("a") == 0  # index 1 == last_reused(0)+1 → delta 0
    assert enc.name_ref("b") == 0  # index 2 == last_reused(1)+1 → delta 0
    assert enc.name_ref("a") == 1  # index 1 != 2+1 → literal index


def test_prefix_ref_empty_start():
    enc = EncoderLookup(8)
    # empty prefix with nothing referenced yet → 0 without table touch
    assert enc.prefix_ref("") == 0


def test_datatype_ref_no_delta():
    enc = EncoderLookup(8)
    enc.entry_id("dt1")
    enc.entry_id("dt2")
    assert enc.datatype_ref("dt1") == 1
    assert enc.datatype_ref("dt1") == 1  # never 0
