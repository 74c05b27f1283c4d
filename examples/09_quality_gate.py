"""Data-quality gate: expectation rules + referential integrity + an
incremental aggregate state — the checks a table passes before a
training job is allowed to consume it.

Run: python examples/09_quality_gate.py
"""

import json
import sys

sys.path.insert(0, ".")

import ray

from pyjelly_ray.stages.agg import agg_state, finalize_agg_state, merge_agg_state
from pyjelly_ray.stages.validate import validate_foreign_key, validate_table

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

SF = "/root/testdata/sf0.001"
orders = ray.data.read_parquet(f"{SF}/orders.parquet")
customer = ray.data.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])

# 1. table-level expectations (map-side partial counts; `unique` rides the
#    hash-exchange aggregate)
report = validate_table(
    orders,
    [
        {"rule": "orderkey_unique", "column": "o_orderkey", "kind": "unique"},
        {"rule": "custkey_not_null", "column": "o_custkey", "kind": "not_null"},
        {"rule": "status_enum", "column": "o_orderstatus", "kind": "in_set",
         "values": ["F", "O", "P"]},
        {"rule": "priority_format", "column": "o_orderpriority", "kind": "regex",
         "pattern": "^[1-5]-"},
    ],
).take_all()

# 2. referential integrity: orders → customer (dimension ref → broadcast anti)
fk = validate_foreign_key(
    orders, rule="orders_custkey_fk", column="o_custkey",
    ref_ds=customer, ref_column="c_custkey",
).take_all()

rows = sorted(report + fk, key=lambda r: r["rule"])
print(json.dumps({"rules": rows, "all_passed": all(r["passed"] for r in rows)},
                 indent=2))

# 3. incremental stats state: persist mergeable moments, fold a delta in
#    without rescanning (materialized-view maintenance)
specs = [("n", "o_totalprice", "count"), ("avg_price", "o_totalprice", "mean")]
half = orders.map_batches(lambda b: b.slice(0, b.num_rows // 2),
                          batch_format="pyarrow")
rest = orders.map_batches(lambda b: b.slice(b.num_rows // 2),
                          batch_format="pyarrow")
state = agg_state(half, ["o_orderstatus"], specs)
merged = merge_agg_state([state], ["o_orderstatus"], specs, deltas=[rest])
print(finalize_agg_state(merged, ["o_orderstatus"], specs, round_to=2).take_all())

ray.shutdown()
