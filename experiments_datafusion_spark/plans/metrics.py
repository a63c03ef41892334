"""Runtime query metrics — the EXPLAIN ANALYZE surface.

DataFusion 19 exposes `EXPLAIN ANALYZE` (per-operator runtime counters;
dependency surface, Cargo.toml:10).  Spark's public equivalents, both used
here:

* `pyspark.sql.Observation` — named aggregates evaluated inline during the
  action, collected driver-side with no second job and no extra scan;
* the post-execution physical plan — under AQE the *final* plan (actual
  join strategies picked, shuffles coalesced) only exists after the action
  ran, so capturing `explain` text afterwards is the honest record of what
  executed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation

from experiments_datafusion_spark.plans.audit import explain_str


def run_with_metrics(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[dict[str, object], str]:
    """Execute ``df`` to a noop sink, returning (observed metrics, final
    physical plan text).  The observation rides the main pass — nothing is
    recomputed and nothing but the scalar metric values reaches the driver."""
    obs = Observation("edfs_metrics")
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    observed.write.format("noop").mode("overwrite").save()
    return obs.get, explain_str(observed, "formatted")
