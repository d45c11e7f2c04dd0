"""Accumulators — the reference's only aggregate-function library.

Reference model (accumulator.go:12-17, SURVEY.md §2.4): an Accumulator
consumes every row worker-locally, then the coordinator merges the
per-worker accumulators; merge order is nondeterministic so only
commutative merges are portable — which is exactly Spark's aggregate
contract.

Built-ins (accumulators/count.go, sum.go, composed.go) compile straight
to ``df.agg`` — Spark's partial aggregation IS the worker-local phase
and its final aggregation IS the coordinator merge, with map-side
combine for free. Custom Python accumulators run per-Arrow-batch via
``mapInPandas`` emitting one serialized state per batch, merged on the
driver (states are tiny; the data never leaves the executors).
"""

from __future__ import annotations

import pickle
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Counter:
    """count(*) — reference: accumulators/count.go:11-50."""

    def exprs(self) -> list[Column]:
        return [F.count(F.lit(1)).alias("count")]

    def finish(self, row: Any) -> int:
        return row["count"]


@dataclass(frozen=True)
class Adder:
    """sum(col) as float64 over any numeric column — reference:
    accumulators/sum.go:12-123."""

    column: str

    def exprs(self) -> list[Column]:
        return [F.sum(F.col(self.column).cast("double")).alias(f"sum_{self.column}")]

    def finish(self, row: Any) -> float:
        v = row[f"sum_{self.column}"]
        return 0.0 if v is None else float(v)


class Compose:
    """Run several accumulators side-by-side in one pass — reference:
    accumulators/composed.go:12-96. Returns a tuple of results."""

    def __init__(self, *accumulators: Any):
        self.accumulators = accumulators

    def exprs(self) -> list[Column]:
        out: list[Column] = []
        for acc in self.accumulators:
            out.extend(acc.exprs())
        return out

    def finish(self, row: Any) -> tuple:
        return tuple(acc.finish(row) for acc in self.accumulators)


@dataclass(frozen=True)
class PyAccumulator:
    """Custom accumulator escape hatch (reference extension point:
    accumulator.go:12-17 — user-defined Accumulate/Merge).

    ``accumulate(pdf)`` folds an Arrow batch into a state value;
    ``merge(a, b)`` must be commutative+associative (the reference's
    coordinator merges in nondeterministic order too). ``zero`` is the
    identity state.
    """

    accumulate: Callable[[pd.DataFrame], Any]
    merge: Callable[[Any, Any], Any]
    zero: Any = None


def run_accumulator(df: DataFrame, acc: Any) -> Any:
    if isinstance(acc, PyAccumulator):
        return _run_py_accumulator(df, acc)
    rows = df.agg(*acc.exprs()).collect()
    return acc.finish(rows[0])


def _run_py_accumulator(df: DataFrame, acc: PyAccumulator) -> Any:
    merge = acc.merge
    accumulate = acc.accumulate

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = None
        for pdf in batches:
            s = accumulate(pdf)
            state = s if state is None else merge(state, s)
        if state is not None:
            yield pd.DataFrame({"state": [pickle.dumps(state)]})

    partials = df.mapInPandas(_partial, "state binary").collect()
    result = acc.zero
    for row in partials:
        s = pickle.loads(bytes(row["state"]))
        result = s if result is None else merge(result, s)
    return result
