"""Spatial-skew handling: hot-cell detection + salted repartitioning.

BASELINE.json north_star: "salted repartitioning on hot cells to defeat
spatial skew".  Dense cities concentrate points into few cells; any
per-cell shuffle (collect_list postings, windowed ranking, non-algebraic
aggs) then bottlenecks on a handful of reducer tasks.  Strategy:

1. cheap pre-pass: count rows per cell (partial-agg, tiny shuffle).
2. cells above ``target_rows_per_task`` get a salt fan-out factor
   s = ceil(count / target); others keep salt 0.
3. repartition on (cell, salt) — hot cells spread over s tasks.
4. two-phase aggregation: partial agg on (cell, salt), final on cell —
   the final shuffle carries s rows per hot cell instead of millions.

AQE's skew-join splitting (enabled in plans.session) is the runtime
backstop; explicit salting is the deterministic guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cells(
    df: DataFrame, cell_col: str, target_rows_per_task: int = 1_000_000
) -> DataFrame:
    """(cell, n, salt_factor) for cells that need salting."""
    return (
        df.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > target_rows_per_task)
        .withColumn(
            "salt_factor",
            F.ceil(F.col("n") / F.lit(target_rows_per_task)).cast("int"),
        )
    )


def with_salt(
    df: DataFrame,
    cell_col: str,
    hot: DataFrame,
    seed_col: str | None = None,
) -> DataFrame:
    """Add a ``salt`` column: 0 for cold cells; [0, salt_factor) for hot
    cells, derived deterministically from ``seed_col`` (or, when None, a
    hash of the full row content).  The salt MUST be retry-stable — it
    feeds a groupBy key, and a nondeterministic source (e.g.
    monotonically_increasing_id) would re-salt recomputed rows
    differently on a stage retry, double-counting or losing them in the
    final merge.  Caveat of the content-hash default: byte-identical
    duplicate rows share a salt, so a hot cell made of ONE repeated row
    stays hot — pass a distinct seed_col there."""
    seed = (
        F.abs(F.hash(F.col(seed_col)))
        if seed_col
        else F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
    )
    joined = df.join(
        F.broadcast(hot.select(cell_col, "salt_factor")), cell_col, "left"
    )
    return joined.withColumn(
        "salt",
        F.when(
            F.col("salt_factor").isNotNull(),
            (seed % F.col("salt_factor")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("salt_factor")


def salted_agg(
    df: DataFrame,
    cell_col: str,
    aggs: dict[str, tuple],
    target_rows_per_task: int = 1_000_000,
    seed_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (partial_fn, final_fn) where partial_fn
    computes per-(cell,salt) and final_fn merges per cell, e.g.
    {"n": (F.count(F.lit(1)), F.sum), "total": (F.sum("v"), F.sum)}.
    """
    hot = hot_cells(df, cell_col, target_rows_per_task)
    salted = with_salt(df, cell_col, hot, seed_col=seed_col)
    partial = salted.groupBy(cell_col, "salt").agg(
        *[p.alias(f"_p_{name}") for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(cell_col).agg(
        *[fin(F.col(f"_p_{name}")).alias(name) for name, (_, fin) in aggs.items()]
    )
