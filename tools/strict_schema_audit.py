"""Strict Arrow-type audit: every oracled query's output schema vs DuckDB.

The driver's correctness gate normalizes types before hashing, so cosmetic
drift (timestamp-vs-date, int32-vs-int64) passes it silently; this tool
holds the pipeline to EXACT Arrow-type parity with the oracle.  Run:

    python tools/strict_schema_audit.py [sf_dir] [--only name1,name2]

Prints one line per mismatching query (column, ray type, oracle type) and a
summary; exit code 1 if any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_table(r) -> pa.Table:
    if isinstance(r, pa.Table):
        return r
    if hasattr(r, "iter_batches"):
        bs = [b for b in r.iter_batches(batch_format="pyarrow")]
        bs = [b for b in bs if b.num_rows] or bs[:1]
        return pa.concat_tables(bs, promote_options="default") if bs else pa.table({})
    return pa.Table.from_pandas(r)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    names = [n for n in qs if n in osql and (only is None or n in only)]
    bad, errs = [], []
    for i, n in enumerate(names):
        try:
            rt = to_table(qs[n](sf))
            ot = con.execute(osql[n]).fetch_arrow_table()
        except Exception as e:  # pragma: no cover - audit tool
            errs.append((n, repr(e)[:200]))
            continue
        for f in rt.schema:
            if f.name in ot.column_names and f.type != ot.schema.field(f.name).type:
                bad.append((n, f.name, str(f.type), str(ot.schema.field(f.name).type)))
                print(f"MISMATCH {n}.{f.name}: ray={f.type} oracle={ot.schema.field(f.name).type}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"-- {i + 1}/{len(names)} audited, {len(bad)} mismatches", flush=True)
    print(f"DONE {len(names)} queries, {len(bad)} mismatched columns, {len(errs)} errors")
    for n, e in errs:
        print("ERROR", n, e)
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
