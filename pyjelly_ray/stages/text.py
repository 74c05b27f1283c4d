"""Text analysis operators for training-data pipelines.

All vectorized over Arrow string columns inside ``map_batches``:
tokenization, quality scoring (stopword/punct/word-length ratios), n-gram
language ID, rolling-hash document fingerprints, exact-dedup keys.

Tokenization contract (shared with the SQL oracles): tokens are the
non-empty pieces of splitting on single spaces — the synthetic ``documents``
table is single-space separated, so Arrow and DuckDB agree exactly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a")


def add_tokens(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append list<string> ``tokens`` and int64 ``n_tokens`` columns."""
    toks = pc.split_pattern(batch.column(col), " ")
    batch = batch.append_column("tokens", toks)
    return batch.append_column("n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))


def token_stats(batch: pa.Table) -> pa.Table:
    """Per-doc token metrics (doc_id, lang, n_tokens, n_chars_check)."""
    batch = add_tokens(batch)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_tokens": batch.column("n_tokens"),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
        }
    )


def quality_scores(batch: pa.Table) -> pa.Table:
    """Per-doc quality features: stopword ratio, mean token length.

    quality = 1 - stopword_ratio (toy but deterministic & SQL-expressible).
    """
    batch = add_tokens(batch)
    toks = batch.column("tokens")
    n = pc.cast(batch.column("n_tokens"), pa.float64())
    flat_is_stop = pc.is_in(
        pc.list_flatten(toks), value_set=pa.array(STOPWORDS, pa.string())
    )
    # re-aggregate flat per-token flags back per row via list offsets
    stop_counts = []
    mean_lens = []
    offset = 0
    toks_c = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat_is_stop = (
        flat_is_stop.combine_chunks()
        if isinstance(flat_is_stop, pa.ChunkedArray)
        else flat_is_stop
    )
    flat_len = pc.utf8_length(pc.list_flatten(toks))
    flat_len = flat_len.combine_chunks() if isinstance(flat_len, pa.ChunkedArray) else flat_len
    lengths = pc.list_value_length(toks).to_pylist()
    stop_py = flat_is_stop.to_pylist()
    len_py = flat_len.to_pylist()
    for ln in lengths:
        seg_stop = stop_py[offset : offset + ln]
        seg_len = len_py[offset : offset + ln]
        stop_counts.append(sum(1 for x in seg_stop if x))
        mean_lens.append(sum(seg_len) / ln if ln else 0.0)
        offset += ln
    stop_ratio = pc.divide(pa.array(stop_counts, pa.float64()), n)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "stopword_ratio": pc.round(stop_ratio, ndigits=6),
            "mean_token_len": pc.round(pa.array(mean_lens, pa.float64()), ndigits=6),
        }
    )


#: tiny per-language marker vocabulary for the n-gram/stopword language ID
_LANG_MARKERS = {
    "en": {"the", "and", "of"},
    "es": {"el", "la", "de"},
    "de": {"der", "die", "und"},
}


class LanguageID:
    """Heuristic language ID (actor-pool stage; marker tables built once)."""

    def __init__(self) -> None:
        self.markers = {k: pa.array(sorted(v), pa.string()) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        scores = {}
        n = pc.cast(pc.list_value_length(toks), pa.float64())
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_pylist()
        for lang, vocab in self.markers.items():
            hits = pc.is_in(flat, value_set=vocab)
            hits = hits.combine_chunks() if isinstance(hits, pa.ChunkedArray) else hits
            hp = hits.to_pylist()
            off = 0
            per_row = []
            for ln in lengths:
                per_row.append(sum(1 for x in hp[off : off + ln] if x))
                off += ln
            scores[lang] = per_row
        n_py = [max(x, 1) for x in pc.cast(n, pa.int64()).to_pylist()]
        best = []
        for i in range(batch.num_rows):
            ranked = sorted(
                ((scores[lang][i] / n_py[i], lang) for lang in scores),
                key=lambda t: (-t[0], t[1]),
            )
            best.append(ranked[0][1] if ranked[0][0] > 0 else "unk")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(best, pa.string()),
            }
        )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprints: full-text sha1 + 64-bit rolling-window hash."""
    texts = batch.column("text").to_pylist()
    full = [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]
    rolling = []
    for t in texts:
        acc = 0
        h = 0
        for ch in t or "":
            h = (h * 131 + ord(ch)) & 0xFFFFFFFFFFFFFFFF
            acc ^= h
        rolling.append(acc)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "sha1": pa.array(full, pa.string()),
            "rolling64": pa.array(rolling, pa.uint64()),
        }
    )
