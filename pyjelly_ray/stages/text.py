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


def _np_of(arr, dtype):
    """Arrow Array or ChunkedArray → numpy (combining chunks if needed)."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(dtype)


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
    import numpy as np

    batch = add_tokens(batch)
    toks = batch.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.cast(batch.column("n_tokens"), pa.float64())
    flat = pc.list_flatten(toks)
    offs = toks.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    # per-token flags/lengths → per-doc sums via one segmented reduce each
    stop_np = _np_of(
        pc.is_in(flat, value_set=pa.array(STOPWORDS, pa.string())), np.float64
    )
    len_np = _np_of(pc.utf8_length(flat), np.float64)
    if len(stop_np):
        stop_counts = np.add.reduceat(stop_np, offs[:-1])
        sum_lens = np.add.reduceat(len_np, offs[:-1])
    else:
        stop_counts = np.zeros(len(lens))
        sum_lens = np.zeros(len(lens))
    mean_lens = np.divide(sum_lens, lens, out=np.zeros(len(lens)), where=lens > 0)
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
        import numpy as np

        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pred_lang": pa.array([], pa.string())}
            )
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        offs = toks.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        n_tok = np.maximum(lens, 1).astype(np.float64)
        langs = sorted(self.markers)
        rows = []
        for lang in langs:
            hits = _np_of(pc.is_in(flat, value_set=self.markers[lang]), np.float64)
            per_doc = np.add.reduceat(hits, offs[:-1]) if len(hits) else np.zeros(len(lens))
            rows.append(per_doc / n_tok)
        scores = np.vstack(rows)  # (n_langs, n_docs)
        # argmax returns the FIRST max; langs are sorted ascending, so ties
        # break to the lexicographically smallest language — same rule as
        # sorting by (-score, lang)
        best_idx = scores.argmax(axis=0)
        best = np.where(scores.max(axis=0) > 0, np.array(langs)[best_idx], "unk")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(best, pa.string()),
            }
        )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprints: full-text sha1 + 64-bit rolling-window hash.

    The rolling value is XOR over prefix hashes ``h_i = h_{i-1}*131 + c_i``
    (mod 2^64).  Vectorized closed form: ``h_i = 131^i · Σ_{j≤i} c_j·131^{-j}``
    — 131 is odd so its mod-2^64 inverse exists; a global cumsum minus the
    per-doc start gives every prefix hash in one pass, bit-identical to the
    per-char loop.
    """
    import numpy as np

    texts = batch.column("text").to_pylist()
    full = [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]
    lens = np.array([len(t or "") for t in texts], np.int64)
    total = int(lens.sum())
    rolling = np.zeros(len(texts), np.uint64)
    if total:
        codes = np.frombuffer(
            "".join(t or "" for t in texts).encode("utf-32-le"), np.uint32
        ).astype(np.uint64)
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        max_len = int(lens.max())
        base = np.uint64(131)
        inv = np.uint64(pow(131, -1, 1 << 64))
        pows = np.empty(max_len, np.uint64)
        ipows = np.empty(max_len, np.uint64)
        pows[0] = ipows[0] = 1
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the point
            for i in range(1, max_len):
                pows[i] = pows[i - 1] * base
                ipows[i] = ipows[i - 1] * inv
        pref = np.cumsum(codes * ipows[within]).astype(np.uint64)
        dstart = (np.cumsum(lens) - lens)[lens > 0]
        seg_base = np.zeros(total, np.uint64)
        first = pref[dstart] - codes[dstart] * ipows[within[dstart]]
        seg_base[dstart] = np.diff(np.concatenate(([np.uint64(0)], first)))
        pref = pref - np.cumsum(seg_base).astype(np.uint64)
        h = pref * pows[within]
        acc = np.bitwise_xor.reduceat(h, dstart)
        rolling[lens > 0] = acc
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "sha1": pa.array(full, pa.string()),
            "rolling64": pa.array(rolling, pa.uint64()),
        }
    )


def json_int_field(batch: pa.Table, col: str, field: str,
                   out: str | None = None) -> pa.Table:
    """Extract an integer JSON field from a string column, vectorized.

    Semi-structured payload columns (event properties, API logs) are a
    training-data staple; at 100 TB a Python ``json.loads`` per row is the
    classic hot-path mistake.  This uses ONE ``pc.extract_regex`` pass (RE2,
    no backtracking) over the Arrow string column — rows without the field
    (or a non-integer value) come back NULL, matching
    ``CAST(json_extract_string(col, '$.field') AS BIGINT)`` in DuckDB for
    flat JSON objects.  Nested-object paths are out of scope by design:
    a real nested schema should be exploded into typed columns at ingest.
    """
    import re

    pat = '"' + re.escape(field) + '"\\s*:\\s*(?P<v>-?\\d+)'
    hits = pc.extract_regex(batch.column(col), pattern=pat)
    val = pc.cast(pc.struct_field(hits, "v"), pa.int64())
    return batch.append_column(out or field, val)


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_token_counts(batch: pa.Table, col: str = "text",
                       pattern: str = BPE_ISH_PATTERN,
                       out: str = "n_bpe_tokens") -> pa.Table:
    """BPE-ish token count per row: ONE vectorized RE2 pass
    (``pc.count_substring_regex``), no per-row tokenizer loop.

    The default pattern segments like a byte-pair pre-tokenizer's coarse
    split (letter runs | digit runs | single punctuation) — the standard
    cheap proxy for "model tokens" when budgeting a training corpus.
    DuckDB's ``length(regexp_extract_all(col, pattern))`` is the exact
    oracle (both engines are RE2, so leftmost-first alternation and
    non-overlap semantics agree).
    """
    n = pc.count_substring_regex(batch.column(col), pattern=pattern)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def bigrams(batch: pa.Table, col: str = "text",
            out: str = "bigram") -> pa.Table:
    """Explode each row's text into adjacent token pairs, fully vectorized.

    Tokens are the single-space split (the corpus contract shared with the
    SQL oracles).  The kernel works on the FLATTENED token array: joining
    ``flat[:-1]`` with ``flat[1:]`` yields every adjacent pair in one Arrow
    call, then a boolean mask drops the pairs that straddle a document
    boundary (computed from the list offsets) — no per-document Python.
    Output is one ``bigram`` string column (other columns are dropped:
    n-gram counting wants the exploded stream, not row alignment).
    """
    import numpy as np

    toks = pc.split_pattern(batch.column(col), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    m = len(flat)
    if m < 2:
        return pa.table({out: pa.array([], pa.string())})
    pairs = pc.binary_join_element_wise(
        flat.slice(0, m - 1), flat.slice(1, m - 1), " "
    )
    offsets = np.asarray(toks.offsets)
    offsets = offsets - offsets[0]
    valid = np.ones(m - 1, bool)
    interior = offsets[1:-1]  # document boundaries inside the flat array
    interior = interior[(interior > 0) & (interior < m)]
    valid[interior - 1] = False  # pair (end-1, end) spans two documents
    return pa.table({out: pairs.filter(pa.array(valid))})


def doc_ngrams(batch: pa.Table, *, n: int = 2, col: str = "text",
               id_col: str = "doc_id", out: str = "ngram") -> pa.Table:
    """Explode each row into word n-grams KEEPING the row id, vectorized.

    Same flattened-token-array trick as :func:`bigrams` generalized to n:
    the j-th n-gram starts at flat position j and is valid iff all n
    tokens fall in one document — checked with one offsets comparison, no
    per-document Python.  Docs with < n tokens emit nothing.
    """
    import numpy as np

    toks = pc.split_pattern(batch.column(col), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    m = len(flat)
    id_arr = batch.column(id_col)
    id_type = batch.schema.field(id_col).type
    if m < n:
        return pa.table({id_col: pa.array([], id_type),
                         out: pa.array([], pa.string())})
    grams = flat.slice(0, m - n + 1)
    for j in range(1, n):
        grams = pc.binary_join_element_wise(
            grams, flat.slice(j, m - n + 1), " "
        )
    offsets = np.asarray(toks.offsets)
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    # doc index of each flat position; an n-gram at j is valid iff
    # position j and j+n-1 share a document
    doc_of = np.repeat(np.arange(len(lens)), lens)
    valid = doc_of[: m - n + 1] == doc_of[n - 1:]
    ids_np = id_arr.to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(ids_np[doc_of[: m - n + 1][valid]], id_type),
        out: grams.filter(pa.array(valid)),
    })


def lm_perplexity(ds, *, col: str = "text", id_col: str = "doc_id",
                  alpha: float = 0.1, round_to: int = 6):
    """Bigram language-model perplexity per document — the CCNet-style
    quality filter: train add-α bigram probabilities on the corpus itself,
    then score each doc with ``exp(−mean ln p(w₂|w₁))`` (low = fluent /
    repetitive, high = noise).  The context count is the token's full
    unigram count (documented convention, matched by the SQL oracle).

    Fully distributed: two count grouped_aggs (bigram, unigram), vocab
    size from the unigram table, two hash joins attaching counts to the
    per-doc bigram stream, one mean grouped_agg per doc.  Raw text is
    tokenized twice (train + score) — at 100 TB persist the exploded
    stream once instead.
    """
    import numpy as np

    from .agg import grouped_agg, round_like_duckdb
    from .joins import hash_join

    bg = ds.map_batches(
        lambda b: doc_ngrams(b, n=2, col=col, id_col=id_col, out="bigram"),
        batch_format="pyarrow",
    )
    bc = grouped_agg(bg, ["bigram"], [("cb", "bigram", "count")])
    uni = ds.map_batches(
        lambda b: doc_ngrams(b, n=1, col=col, id_col=id_col, out="tok"),
        batch_format="pyarrow",
    )
    uc = grouped_agg(
        uni.map_batches(lambda b: b.select(["tok"]), batch_format="pyarrow"),
        ["tok"], [("cu", "tok", "count")],
    ).materialize()  # used twice (vocab size + join); bounded by |vocab|
    vocab = uc.count()

    j1 = hash_join(bg, bc, left_key="bigram")

    def add_ctx(b: pa.Table) -> pa.Table:
        ctx = pc.list_element(pc.split_pattern(b.column("bigram"), " "), 0)
        return b.append_column("ctx", ctx)

    j2 = hash_join(j1.map_batches(add_ctx, batch_format="pyarrow"), uc,
                   left_key="ctx", right_key="tok")

    def lnp(b: pa.Table) -> pa.Table:
        import numpy as np

        cb = b.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        cu = b.column("cu").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            id_col: b.column(id_col),
            "lnp": pa.array(np.log((cb + alpha) / (cu + alpha * vocab)),
                            pa.float64()),
        })

    per_doc = grouped_agg(
        j2.map_batches(lnp, batch_format="pyarrow"), [id_col],
        [("n_bigrams", "lnp", "count"), ("mean_lnp", "lnp", "mean")],
    )

    def fin(b: pa.Table) -> pa.Table:
        import numpy as np

        m = b.column("mean_lnp").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: b.column(id_col),
            "n_bigrams": b.column("n_bigrams"),
            "perplexity": round_like_duckdb(
                pa.array(np.exp(-m), pa.float64()), round_to),
        })

    return per_doc.map_batches(fin, batch_format="pyarrow")


def ngram_decontaminate(train_ds, bench_ds, *, n: int = 3,
                        col: str = "text", id_col: str = "doc_id"):
    """Benchmark decontamination by n-gram overlap — the pretraining-
    hygiene operator: a training doc is contaminated when it shares ANY
    word n-gram with the benchmark set (the GPT-3/Llama-style check,
    stricter than exact-text dedup).

    The benchmark's DISTINCT n-grams are collected once and broadcast via
    ``ray.put`` (small side by construction — eval sets are tiny next to
    the corpus); each training block then runs one vectorized
    ``pc.is_in`` membership probe, no shuffle of the training side.  For
    a huge benchmark swap the broadcast set for ``build_bloom`` +
    ``bloom_semi`` + exact residue (same shapes).  Output per training
    doc that HAS at least n tokens: ``n_hits`` (occurrence count of
    benchmark n-grams) and ``contaminated`` flag.
    """
    import numpy as np
    import ray

    from .agg import grouped_agg

    bench_grams = grouped_agg(
        bench_ds.map_batches(
            lambda b: doc_ngrams(b, n=n, col=col, id_col=id_col).select(["ngram"]),
            batch_format="pyarrow",
        ),
        ["ngram"], [("c", "ngram", "count")],
    )
    gram_tables = [t for t in ray.get(bench_grams.to_arrow_refs())
                   if t.num_columns > 0 and t.num_rows > 0]
    gram_arr = (pa.concat_tables(gram_tables).column("ngram").combine_chunks()
                if gram_tables else pa.array([], pa.string()))
    gram_ref = ray.put(gram_arr)

    def probe(b: pa.Table) -> pa.Table:
        import ray as _ray

        grams = doc_ngrams(b, n=n, col=col, id_col=id_col)
        hit = pc.cast(
            pc.is_in(grams.column("ngram"), value_set=_ray.get(gram_ref)),
            pa.int64(),
        )
        return pa.table({id_col: grams.column(id_col), "hit": hit})

    hits = train_ds.map_batches(probe, batch_format="pyarrow")
    agg = grouped_agg(hits, [id_col],
                      [("n_hits", "hit", "sum")], sum_as_float=False)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "n_hits": b.column("n_hits"),
            "contaminated": pc.cast(
                pc.greater(b.column("n_hits"), pa.scalar(0)), pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


# Default PII redaction rules.  Patterns are deliberately RE2-compatible
# (no backreferences/lookaround) so the SAME regex runs in Arrow's
# replace_substring_regex (RE2), DuckDB's regexp_replace (RE2), and
# Python's re — the oracle compares redacted text cell-by-cell.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d{1,2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
]


def redact_pii(batch: pa.Table, col: str = "text",
               rules: list[tuple[str, str, str]] | None = None,
               out_col: str | None = None) -> pa.Table:
    """Scrub PII from a text column — the mandatory pass before any corpus
    leaves the pipeline.  Fully vectorized: one Arrow RE2
    ``replace_substring_regex`` kernel per rule (no Python loop over rows),
    plus a per-row ``count_substring_regex`` hit count per rule
    (``n_<rule>`` columns) so the downstream audit aggregate is free.
    Rules apply in order (e.g. emails are consumed before the looser
    patterns can touch their digits/dots)."""
    rules = PII_RULES if rules is None else rules
    text = pc.cast(batch.column(col), pa.large_string())
    counts = {}
    for name, pattern, replacement in rules:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pattern=pattern), pa.int64()
        )
        text = pc.replace_substring_regex(
            text, pattern=pattern, replacement=replacement
        )
    if out_col is None:
        out = batch.set_column(
            batch.schema.get_field_index(col), col, pc.cast(text, pa.string())
        )
    else:
        out = batch.append_column(out_col, pc.cast(text, pa.string()))
    for k, v in counts.items():
        out = out.append_column(k, v)
    return out
