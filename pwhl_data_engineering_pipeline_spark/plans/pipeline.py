"""Pipeline orchestrator — reference run_pipeline.py semantics (ordered,
skippable, timed, fail-fast: run_pipeline.py:30-68) on one SparkSession.

The subprocess-per-stage isolation of the reference disappears: stages are
pure DataFrame→DataFrame functions chained lazily; persistence boundaries
(the reference's CSV hops) become optional Parquet checkpoints. Lineage +
deterministic stages give the same restartability with none of the process
overhead.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..quality import Contract
from . import capacity as capacity_stage
from . import integrate as integrate_stage
from . import sales as sales_stage
from . import star as star_stage
from . import weather as weather_stage

log = logging.getLogger("pwhl_spark.pipeline")


@dataclass
class StageResult:
    name: str
    seconds: float
    skipped: bool = False


@dataclass
class Orchestrator:
    """Ordered, timed, fail-fast stage runner (EP1 parity)."""

    results: list[StageResult] = field(default_factory=list)

    def run_stage(self, name: str, fn: Callable[[], DataFrame | None], skip: bool = False):
        if skip:
            log.warning("skipping stage %s", name)
            self.results.append(StageResult(name, 0.0, skipped=True))
            return None
        t0 = time.monotonic()
        out = fn()
        self.results.append(StageResult(name, time.monotonic() - t0))
        log.info("stage %s finished in %.2fs", name, self.results[-1].seconds)
        return out


def run_reference_pipeline(
    spark: SparkSession,
    hourly_weather_raw: DataFrame,
    ticket_sales_raw: DataFrame,
    capacity_raw: DataFrame,
    markets: DataFrame,
    contract: Contract | None = None,
    weather_parity: str = "native",
) -> DataFrame:
    """The full reference pipeline (EP1: 5 transform stages + star layer) as
    one lazy plan; returns the 20-column fact. Callers write it with
    ``writers.write_parquet_partitioned(fact, path, ("event_date",),
    ("market","venue_id","section"))`` for the reference's warehouse layout.
    """
    contract = contract or Contract(mode="warn")
    orch = Orchestrator()

    tidy = orch.run_stage(
        "transform_weather.tidy",
        lambda: weather_stage.tidy_hourly(hourly_weather_raw, markets, contract),
    )
    daily = orch.run_stage(
        "transform_weather.daily",
        lambda: weather_stage.daily_rollup(tidy, parity=weather_parity),
    )
    cleaned_sales = orch.run_stage(
        "clean_ticket_sales",
        lambda: sales_stage.stamp_markets(
            sales_stage.clean_sales(ticket_sales_raw, contract), markets
        ),
    )
    cap = orch.run_stage(
        "clean_section_capacity",
        lambda: capacity_stage.replicate_per_market(
            capacity_stage.clean_capacity(capacity_raw, contract), markets
        ),
    )
    agg = orch.run_stage(
        "integrate.aggregate_sales",
        lambda: integrate_stage.aggregate_sales(cleaned_sales),
    )
    fact = orch.run_stage(
        "integrate.build_fact",
        lambda: integrate_stage.build_fact(agg, cap, daily, contract),
    )
    orch.run_stage(
        "star.register", lambda: star_stage.register_star(spark, fact, markets)
    )
    return fact
