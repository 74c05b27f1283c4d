"""Hypothesis-testing tour: the distributed statistics workbench —
k-sample location and dispersion tests (ANOVA, Kruskal-Wallis,
Brown-Forsythe), two-sample rank and proportion tests (Mann-Whitney U,
two-proportion z, McNemar), survival comparison (log-rank + per-arm
Kaplan-Meier), and trend/association estimators (Mann-Kendall +
Theil-Sen, Kendall tau-b, partial correlation, lead-lag CCF).  Every
statistic collapses the raw stream through one-or-two combiner
exchanges and finalizes over a tiny table; each has a cell-exact DuckDB
oracle in the test suite.

Run: python examples/13_hypothesis_testing.py
"""

import sys

sys.path.insert(0, ".")

import ray

from pyjelly_ray.pipelines.relational import (
    q_click_mcnemar,
    q_click_purchase_ccf,
    q_conversion_ztest,
    q_daily_qty_revenue_kendall,
    q_daily_revenue_trend,
    q_dow_value_kruskal,
    q_event_type_anova,
    q_event_type_brown_forsythe,
    q_qty_price_partial_corr,
    q_user_lifetime_logrank,
    q_weekend_value_mannwhitney,
)

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

SF = "/root/testdata/sf0.001"

a = q_event_type_anova(SF).take_all()[0]
print(f"one-way ANOVA across event types: F={a['f_stat']} "
      f"eta^2={a['eta_sq']} (k={a['k_groups']}, n={a['n_total']})")

k = q_dow_value_kruskal(SF).take_all()[0]
print(f"Kruskal-Wallis across days-of-week: H={k['h_stat']} "
      f"tie-corrected={k['h_tie_corrected']}")

b = q_event_type_brown_forsythe(SF).take_all()[0]
print(f"Brown-Forsythe (dispersion): F={b['f_stat']}")

print("\nMann-Whitney U weekend vs weekday per type:")
for r in sorted(q_weekend_value_mannwhitney(SF).take_all(),
                key=lambda r: r["event_type"]):
    print(f"  {r['event_type']}: U={r['u_stat']} z={r['z_stat']}")

z = q_conversion_ztest(SF).take_all()[0]
print(f"\ntwo-proportion z (conversion A vs B): "
      f"{z['rate_a']} vs {z['rate_b']} z={z['z_prop']}")

m = q_click_mcnemar(SF).take_all()[0]
print(f"McNemar paired click switch: b={m['n_first_only']} "
      f"c={m['n_second_only']} chi2={m['chi2_mcnemar']}")

lr = q_user_lifetime_logrank(SF).take_all()[0]
print(f"log-rank (lifetime A vs B): O_A={lr['observed_a']} "
      f"E_A={lr['expected_a']} chi2={lr['chi2_logrank']}")

t = q_daily_revenue_trend(SF).take_all()[0]
print(f"\nMann-Kendall daily-revenue trend: S={t['s_stat']} z={t['z_mk']} "
      f"Theil-Sen slope={t['sen_slope']}/day")

kt = q_daily_qty_revenue_kendall(SF).take_all()[0]
print(f"Kendall tau-b qty vs revenue: {kt['tau_b']} "
      f"(C={kt['n_concordant']}, D={kt['n_discordant']})")

p = q_qty_price_partial_corr(SF).take_all()[0]
print(f"partial corr qty~price | discount: {p['partial_r_xy_z']} "
      f"(raw r={p['r_xy']})")

print("\nlead-lag CCF clicks -> purchases:")
for r in sorted(q_click_purchase_ccf(SF).take_all(), key=lambda r: r["lag"]):
    print(f"  lag {r['lag']:+d}: ccf={r['ccf']}")

ray.shutdown()
