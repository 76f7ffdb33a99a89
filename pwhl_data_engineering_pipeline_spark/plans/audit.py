"""Plan audit: structured facts about a DataFrame's physical plan.

The questions that decide whether a query survives 100 TB — does the scan
prune columns and push filters? how many exchanges? did a join go
cartesian? how many Python stages? — are all answerable from the executed
plan, but reading `.explain()` by eye doesn't compose. `audit(df)` returns
them as data, for interactive "is my query scale-shaped?" checks and for
the plan-quality regression tests (tests/test_plan_quality.py) that gate
every headline query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_python_stages: int          # ArrowEvalPython / BatchEvalPython / mapInPandas
    has_cartesian: bool           # CartesianProduct / BroadcastNestedLoopJoin
    has_take_ordered: bool        # top-k planned as TakeOrderedAndProject
    partial_aggregation: bool     # map-side partial agg before the exchange
    pushed_filters: list[str] = field(default_factory=list)
    plan: str = ""                # full text, for messages on assertion failure

    @property
    def python_free(self) -> bool:
        return self.n_python_stages == 0


def audit(df: DataFrame) -> PlanAudit:
    """Inspect ``df``'s executed plan (triggers planning, not execution)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed: list[str] = []
    for line in plan.splitlines():
        if "PushedFilters: [" in line:
            inner = line.split("PushedFilters: [", 1)[1].rsplit("]", 1)[0].strip()
            if inner:
                pushed.extend(p.strip() for p in inner.split(","))
    return PlanAudit(
        n_exchanges=plan.count("Exchange "),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=plan.count("SortMergeJoin"),
        n_python_stages=(
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
        ),
        has_cartesian=("CartesianProduct" in plan)
        or ("BroadcastNestedLoopJoin" in plan),
        has_take_ordered="TakeOrderedAndProject" in plan,
        # Only the "partial_" function prefix proves a map-side partial
        # stage; a bare HashAggregate(keys=...) also appears in final-only
        # plans, so matching it would mask a lost partial aggregation.
        partial_aggregation="partial_" in plan,
        pushed_filters=pushed,
        plan=plan,
    )
