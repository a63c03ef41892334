"""Runtime query metrics — the EXPLAIN ANALYZE surface.

DataFusion 19 exposes `EXPLAIN ANALYZE` (per-operator runtime counters;
dependency surface, Cargo.toml:10).  Spark's public equivalents, both used
here:

* `pyspark.sql.Observation` — named aggregates evaluated inline during the
  action, collected driver-side with no second job and no extra scan;
* the post-execution physical plan — under AQE the *final* plan (actual
  join strategies picked, shuffles coalesced) only exists after the action
  ran.  The honest record of what executed is the SQL status store's plan
  description for that execution: SQLAppStatusListener receives the AQE
  plan-update events and rewrites the description at final replan, which is
  exactly what the SQL UI shows as "isFinalPlan=true".  (Asking the
  DataFrame for `queryExecution()` after a write is WRONG — the write ran
  under its own QueryExecution, so the DataFrame's own AQE plan was never
  executed and stays isFinalPlan=false.)
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession


def _execution_ids(spark: SparkSession) -> set[int]:
    store = spark._jsparkSession.sharedState().statusStore()  # noqa: SLF001
    it = store.executionsList().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next().executionId())
    return ids


def _executed_plan_description(
    spark: SparkSession, prior_ids: set[int], timeout_s: float = 15.0
) -> str:
    """Plan description of the newest SQL execution not in ``prior_ids``,
    polled until the (async) listener bus has applied the AQE final-replan
    update or the timeout lapses."""
    store = spark._jsparkSession.sharedState().statusStore()  # noqa: SLF001
    deadline = time.monotonic() + timeout_s
    text = ""
    while time.monotonic() < deadline:
        it = store.executionsList().iterator()
        newest = None
        while it.hasNext():
            e = it.next()
            if e.executionId() not in prior_ids:
                newest = e  # list is ordered by executionId ascending
        if newest is not None:
            text = newest.physicalPlanDescription()
            if "isFinalPlan=false" not in text:
                return text
        time.sleep(0.05)
    return text


def run_with_metrics(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[dict[str, object], str]:
    """Execute ``df`` to a noop sink, returning (observed metrics, executed
    physical plan text).  The observation rides the main pass — nothing is
    recomputed and nothing but the scalar metric values reaches the driver;
    the plan text is the AQE-finalized plan of the write that actually ran."""
    spark = df.sparkSession
    obs = Observation("edfs_metrics")
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    prior = _execution_ids(spark)
    observed.write.format("noop").mode("overwrite").save()
    return obs.get, _executed_plan_description(spark, prior)
