"""Model-monitoring tour: the ML-ops suite over the events stream —
feature-drift PSI, experiment readout (Welch t), classifier eval
(ROC-AUC), dependence screens (MI + chi-square), and streaming
change-point alarms (CUSUM).  Every statistic is a one-or-two-exchange
pipeline with a cell-exact DuckDB oracle in the test suite.

Run: python examples/11_model_monitoring.py
"""

import sys

sys.path.insert(0, ".")

import ray

from pyjelly_ray.pipelines.relational import (
    q_ab_value_ttest,
    q_event_type_dow_chi2,
    q_event_type_dow_mi,
    q_events_value_cusum,
    q_events_value_drift,
    q_purchase_value_auc,
)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

SF = "/root/testdata/sf0.001"

print("feature drift (PSI by reference decile):")
for r in sorted(q_events_value_drift(SF).take_all(), key=lambda r: r["bin"]):
    print(f"  bin {r['bin']}: ref {r['p_ref']:.4f} cur {r['p_cur']:.4f} "
          f"psi_term {r['psi_term']}")

print("\nA/B readout (Welch t per event type):")
for r in sorted(q_ab_value_ttest(SF).take_all(), key=lambda r: r["event_type"]):
    print(f"  {r['event_type']}: mean A {r['mean_a']} vs B {r['mean_b']} "
          f"t={r['t_welch']} df={r['df_welch']}")

auc = q_purchase_value_auc(SF).take_all()[0]["auc"]
print(f"\nROC-AUC of value as purchase classifier: {auc}")

mi = q_event_type_dow_mi(SF).take_all()[0]["mi_nats"]
chi = q_event_type_dow_chi2(SF).take_all()[0]
print(f"event_type × weekday dependence: MI {mi} nats, "
      f"chi2 {chi['chi2']} (df {chi['df']})")

alarms = [r for r in q_events_value_cusum(SF).take_all() if r["alarm"]]
print(f"\nCUSUM alarms fired: {len(alarms)} events")
