"""Incremental materialized-view maintenance with all three persistable
state families — moments (sum/count/var), HLL distinct, t-digest
quantiles: fold a day's delta into yesterday's saved state instead of
rescanning history.  Moment and HLL folds are EXACTLY equal to the
full-table recompute (associative partials); t-digest is equal within
sketch error.

Run: python examples/12_incremental_states.py
"""

import sys

sys.path.insert(0, ".")

import pyarrow.compute as pc
import ray

from pyjelly_ray.stages.agg import (agg_state, finalize_agg_state,
                                    merge_agg_state)
from pyjelly_ray.stages.sketch import (distinct_state,
                                       finalize_distinct_state,
                                       finalize_quantile_state,
                                       merge_distinct_state,
                                       merge_quantile_state, quantile_state)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

SF = "/root/testdata/sf0.001"
CUT = 1705363200000000  # 2024-01-16, µs

ev = ray.data.read_parquet(f"{SF}/events.parquet",
                           columns=["event_type", "user_id", "ts", "value"])
old = ev.map_batches(lambda b: b.filter(
    pc.less(pc.cast(b.column("ts"), "int64"), CUT)), batch_format="pyarrow")
new = ev.map_batches(lambda b: b.filter(
    pc.greater_equal(pc.cast(b.column("ts"), "int64"), CUT)),
    batch_format="pyarrow")

SPECS = [("n", "value", "count"), ("mean_v", "value", "mean")]
s_old = agg_state(old, "event_type", SPECS)
s_inc = merge_agg_state([s_old, agg_state(new, "event_type", SPECS)],
                        "event_type", SPECS)
print("moments (incremental fold):")
for r in sorted(finalize_agg_state(s_inc, "event_type", SPECS,
                                   round_to=4).take_all(),
                key=lambda r: r["event_type"]):
    print("  ", r)

d_inc = merge_distinct_state(
    [distinct_state(old, "event_type", "user_id"),
     distinct_state(new, "event_type", "user_id")], "event_type")
print("\ndistinct users (incremental HLL):")
for r in sorted(finalize_distinct_state(d_inc, "event_type").take_all(),
                key=lambda r: r["event_type"]):
    print("  ", r)

q_inc = merge_quantile_state(
    [quantile_state(old, "event_type", "value"),
     quantile_state(new, "event_type", "value")], "event_type")
print("\nvalue quantiles (incremental t-digest):")
for r in sorted(finalize_quantile_state(
        q_inc, "event_type", [("p50", 0.5), ("p95", 0.95)]).take_all(),
        key=lambda r: r["event_type"]):
    print("  ", r)
