"""Product-analytics tour over the events stream: cohorts, stickiness,
funnels, transition matrix, activity spans — each a one-or-two-exchange
pipeline that stays streaming at any scale.

Run: python examples/10_product_analytics.py
"""

import sys

sys.path.insert(0, ".")

import ray

from pyjelly_ray.pipelines.relational import (
    q_dau_mau_stickiness,
    q_event_funnel,
    q_event_type_transitions,
    q_user_activity_spans,
    q_weekly_retention_cohorts,
)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

SF = "/root/testdata/sf0.001"

cohorts = q_weekly_retention_cohorts(SF).take_all()
print("retention cells (cohort_week, week_offset, n_users):")
for r in sorted(cohorts, key=lambda r: (r["cohort_week"], r["week_offset"]))[:6]:
    print("  ", r)

sticky = sorted(q_dau_mau_stickiness(SF).take_all(), key=lambda r: r["day"])
print(f"\nstickiness: {len(sticky)} days, first/last:")
print("  ", sticky[0])
print("  ", sticky[-1])

funnel = q_event_funnel(SF)
funnel = funnel.take_all() if hasattr(funnel, "take_all") else funnel.to_pylist()
print("\nfunnel:", funnel)

trans = sorted(
    q_event_type_transitions(SF).take_all(),
    key=lambda r: -r["n_transitions"],
)[:5]
print("\ntop transitions:")
for r in trans:
    print(f"   {r['src_type']} -> {r['dst_type']}: {r['n_transitions']}")

spans = q_user_activity_spans(SF).take_all()
merged = sum(r["n_merged"] for r in spans)
print(f"\nactivity spans: {len(spans)} spans covering {merged} events")

ray.shutdown()
