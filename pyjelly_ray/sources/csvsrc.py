"""CSV source with ingest-to-Parquet helper.

Raw training/data drops frequently arrive as sharded CSV; this wraps Ray
Data's Arrow-native CSV reader (C++ block-parallel parse) with the
engine's conventions — column pruning at the read, explicit block
sizing — plus a one-shot ``csv_to_parquet`` converter, because CSV is a
row-major text format that cannot skip columns or predicate-push: at any
real scale you convert ONCE to Parquet and every later read prunes for
free (same posture as the JSONL source).

The reference has no CSV surface (it is a binary RDF codec); this is part
of the training-data engine extensions (SURVEY.md §2.5 posture).
"""

from __future__ import annotations


def read_csv(paths, *, columns: list[str] | None = None,
             num_blocks: int | None = None, **arrow_csv_kwargs):
    """Read CSV into a Dataset (header row expected, types inferred by
    Arrow).  ``columns`` prunes right after the parse; extra kwargs pass
    through to ``pyarrow.csv`` (delimiter, null_values, ...)."""
    import ray

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    ds = ray.data.read_csv(paths, **kw, **arrow_csv_kwargs)
    if columns:
        ds = ds.map_batches(
            lambda b: b.select(columns), batch_format="pyarrow",
            batch_size=None,
        )
    return ds


def csv_to_parquet(paths, out_dir: str, *, columns: list[str] | None = None,
                   num_blocks: int | None = None) -> int:
    """One-shot CSV → Parquet conversion (returns row count).  Do this
    once per drop; all downstream reads then get columnar pruning and
    row-group skipping."""
    ds = read_csv(paths, columns=columns, num_blocks=num_blocks)
    ds = ds.materialize()
    ds.write_parquet(out_dir)
    return ds.count()
