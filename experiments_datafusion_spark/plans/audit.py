"""Plan auditing: machine-checkable assertions about the physical plans
Catalyst produces — the "is this the plan you'd want at 100 TB" gate
(SURVEY.md §4: pushdown/pruning/broadcast are free ONLY if the plan is
declared so they can fire; these helpers prove they fired).

Used by tests/test_plans.py; also handy interactively:
    from experiments_datafusion_spark.plans.audit import explain_str, audit
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanFacts:
    text: str

    def has(self, *needles: str) -> bool:
        return all(n in self.text for n in needles)

    @property
    def n_shuffles(self) -> int:
        """Shuffle exchanges in the plan.  simple-mode explain inlines the
        partitioning ("Exchange hashpartitioning(...)"); formatted mode
        renders the node as "(N) Exchange" with the partitioning on a
        separate Arguments line — count both spellings."""
        inline = self.text.count("Exchange hashpartitioning") + self.text.count(
            "Exchange rangepartitioning"
        )
        formatted = len(re.findall(r"^\(\d+\) Exchange$", self.text, re.M))
        return max(inline, formatted)

    @property
    def n_range_shuffles(self) -> int:
        """Range-partitioned (global-sort) exchanges, both explain spellings."""
        return self.text.count("Exchange rangepartitioning") + len(
            re.findall(r"^Arguments: rangepartitioning", self.text, re.M)
        )

    @property
    def has_pushed_filters(self) -> bool:
        return "PushedFilters: [" in self.text and "PushedFilters: []" not in self.text

    @property
    def has_broadcast_join(self) -> bool:
        return "BroadcastHashJoin" in self.text or "BroadcastNestedLoopJoin" in self.text

    @property
    def has_whole_stage_codegen(self) -> bool:
        # formatted mode shows codegen membership as "[codegen id : N]"
        return "WholeStageCodegen" in self.text or "codegen id" in self.text

    @property
    def has_python_udf(self) -> bool:
        return "BatchEvalPython" in self.text or "ArrowEvalPython" in self.text

    def read_schema_columns(self) -> list[list[str]]:
        """Column lists of every parquet ReadSchema in the plan — the
        column-pruning evidence."""
        cols = []
        for line in self.text.splitlines():
            line = line.strip()
            if line.startswith("ReadSchema:"):
                inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
                cols.append([f.split(":")[0] for f in inner.split(",") if f])
        return cols


def audit(df: DataFrame) -> PlanFacts:
    return PlanFacts(explain_str(df, "formatted"))


def file_scan_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """Post-execution FileSourceScan metrics (numFiles / filesSize /
    numOutputRows) for every parquet scan in the plan — the machine
    evidence that footer-stats row-group pruning fired (a clustered
    layout's scan emits only the surviving row groups' rows, while the
    same predicate over an unclustered layout emits everything).  Walks
    through AQE query stages to the final physical plan."""
    if execute:
        df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStageExec" in name:
            walk(node.plan())
            return
        if "FileSourceScan" in name:
            m = node.metrics()
            it = m.iterator()
            vals = {}
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())  # noqa: SLF001
    return out
