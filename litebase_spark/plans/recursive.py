"""Recursive CTE fixpoint helper (SURVEY §7.2 "custom" row).

SQLite supports WITH RECURSIVE (gated by a CanRecursive permission in the
reference — pkg/database/database_connection.go:662-663); Spark has no
recursive CTE, so we provide an iterative DataFrame fixpoint with UNION
(distinct) semantics, a depth cap mirroring the reference's permission
gate, and lineage truncation so long recursions don't blow up the plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_MAX_ITERATIONS = 100


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = DEFAULT_MAX_ITERATIONS,
    distinct: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Evaluate WITH RECURSIVE semantics: result = base UNION step(base)
    UNION step(step(base)) ... until no new rows.

    * UNION (distinct=True) matches SQLite's `UNION` recursion — each
      iteration only feeds rows not seen before (semi-naive evaluation:
      the step gets the FRONTIER, not the accumulated set, so work per
      iteration is proportional to new rows).
    * distinct=False gives `UNION ALL` recursion with the iteration cap
      as the only terminator.
    * localCheckpoint every few iterations truncates lineage — without
      it the plan doubles each loop and Catalyst analysis dominates.

    Scale note: each iteration shuffles only the frontier (for the
    distinct), so transitive closures with shallow depth (the common
    case: org charts, BOM graphs) cost depth x frontier-shuffles.
    """
    acc = base
    frontier = base
    for i in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.exceptAll(acc).distinct()
        if len(nxt.take(1)) == 0:
            break
        acc = acc.unionAll(nxt)
        frontier = nxt
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    else:
        if distinct:
            raise RecursionError(
                f"recursive_cte did not converge within {max_iterations} "
                "iterations (depth cap — the CanRecursive analog)"
            )
    return acc
