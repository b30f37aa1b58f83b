"""Expectation checks (M5) as a first-class operator.

The reference scatters eager assertions mid-pipeline (count ranges
``modules/AzGeneBurden.py:126-133``, fraction bounds ``modules/ChEMBL.py:59-63``,
invariants ``modules/IMPC.py:295-296``), puncturing the lazy plan ~10 times per
run (SURVEY §7.4 risk 5).  This module batches every expectation into ONE
aggregation action over a persisted frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    pass


@dataclass
class Expectations:
    """Collect named aggregate predicates; evaluate them in a single action."""

    checks: list[tuple[str, Column, Column]] = field(default_factory=list)

    def expect(self, name: str, agg: Column, predicate) -> "Expectations":
        """agg: an aggregate expression; predicate: Column fn over its alias."""
        a = agg.alias(f"__m_{len(self.checks)}")
        self.checks.append((name, a, predicate))
        return self

    def count_between(self, name: str, lo: int, hi: int) -> "Expectations":
        return self.expect(
            name, F.count(F.lit(1)), lambda c: (c >= lo) & (c <= hi)
        )

    def fraction_between(
        self, name: str, cond: Column, lo: float, hi: float
    ) -> "Expectations":
        frac = F.sum(F.when(cond, 1).otherwise(0)) / F.count(F.lit(1))
        return self.expect(name, frac, lambda c: (c >= lo) & (c <= hi))

    def no_rows_where(self, name: str, cond: Column) -> "Expectations":
        return self.expect(
            name, F.sum(F.when(cond, 1).otherwise(0)), lambda c: c == 0
        )

    def unique(self, name: str, *cols: str) -> "Expectations":
        distinct = F.count_distinct(*[F.col(c) for c in cols])
        total = F.count(F.lit(1))
        # evaluated jointly below via two metrics folded into one struct
        metric = F.struct(distinct.alias("d"), total.alias("t"))
        return self.expect(name, metric, lambda s: s["d"] == s["t"])

    def run(self, df: DataFrame) -> dict[str, bool]:
        """ONE collect over all metrics + verdicts; raises listing every
        failed check with its metric value."""
        if not self.checks:
            return {}
        agg_df = df.agg(*[a for _, a, _ in self.checks])
        row = agg_df.select(
            "*",
            *[
                pred(F.col(f"__m_{i}")).alias(f"__v_{i}")
                for i, (_, _, pred) in enumerate(self.checks)
            ],
        ).collect()[0]
        results: dict[str, bool] = {}
        failures = []
        for i, (name, _, _) in enumerate(self.checks):
            ok = bool(row[f"__v_{i}"])
            results[name] = ok
            if not ok:
                failures.append(f"{name} (metric={row[f'__m_{i}']})")
        if failures:
            raise ExpectationError("expectations failed: " + "; ".join(failures))
        return results
