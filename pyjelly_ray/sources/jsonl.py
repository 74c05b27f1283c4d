"""JSONL (newline-delimited JSON) source/sink.

Training corpora very often ship as sharded ``.jsonl`` — this wraps Ray
Data's Arrow-native readers/writers with the engine's conventions:
column pruning at (or right after) the read, explicit block sizing, and
partitioned output (one file per block) so a failed export can resume at
file granularity.  The heavy lifting stays in ``pyarrow.json`` (C++
block-parallel parse) — no Python-level ``json.loads`` per row.

The reference has no JSON surface (it is a binary RDF codec); this is part
of the training-data engine extensions (SURVEY.md §2.5 posture).
"""

from __future__ import annotations

import pyarrow as pa


def read_jsonl(paths, *, columns: list[str] | None = None,
               num_blocks: int | None = None):
    """Read newline-delimited JSON into a Dataset.

    ``pyarrow.json`` infers the schema per block; ``columns`` prunes
    immediately after parse (JSONL is row-major text, so unlike Parquet
    the parse itself cannot skip fields — if a pipeline only ever needs a
    subset, convert to Parquet once and read that instead).
    """
    import ray

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    ds = ray.data.read_json(paths, **kw)
    if columns:
        ds = ds.map_batches(
            lambda b: b.select(columns), batch_format="pyarrow", batch_size=None
        )
    return ds


def write_jsonl(ds, out_dir: str):
    """Write a Dataset as sharded ``.jsonl`` (one file per block, atomic
    per-file visibility via Ray Data's rename-on-complete)."""
    ds.write_json(out_dir)
    return out_dir


def jsonl_to_parquet(paths, out_dir: str, *, columns: list[str] | None = None):
    """One-pass JSONL → Parquet conversion (the recommended ingest step
    before running repeated pipelines: columnar reads then prune at the
    source)."""
    ds = read_jsonl(paths, columns=columns)
    ds.write_parquet(out_dir)
    return out_dir
