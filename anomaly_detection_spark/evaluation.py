"""Labeled evaluation + parameter search — the reference's third entry
point (/root/reference/src/Test.py:151-177 and
AnomalyDetectorWrapper.py:43-54): replay a labeled series through a
detector, derive a binary prediction from the verdict (reference: status
string starts with "Error" == status_code -1), score F1 against the
label column, and grid-search detector parameters for the best F1.

Distributed form: predictions come from any engine check (a code
column); the confusion matrix is one hash aggregate; a parameter grid
evaluates as independent Spark jobs over the SAME cached input (the
scan is paid once) — embarrassingly parallel across a cluster via one
job per candidate, with Catalyst free to share the cached scan.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion(df: DataFrame, *, code_col: str = "code",
              label_col: str = "label") -> dict:
    """Binary confusion counts: prediction = (code == -1), truth =
    (label != 0). One aggregate row; Undefined codes count as negative
    predictions, exactly like the reference's 'Error'-prefix rule."""
    pred = (F.col(code_col) == -1).cast("int")
    truth = (F.col(label_col) != 0).cast("int")
    row = df.agg(
        F.sum(pred * truth).alias("tp"),
        F.sum(pred * (1 - truth)).alias("fp"),
        F.sum((1 - pred) * truth).alias("fn"),
        F.sum((1 - pred) * (1 - truth)).alias("tn"),
    ).first()
    return {k: int(row[k] or 0) for k in ("tp", "fp", "fn", "tn")}


def f1_score(df: DataFrame, *, code_col: str = "code",
             label_col: str = "label") -> float:
    c = confusion(df, code_col=code_col, label_col=label_col)
    denom = 2 * c["tp"] + c["fp"] + c["fn"]
    return (2 * c["tp"] / denom) if denom else 0.0


def grid_search(
    df: DataFrame,
    check_builder: Callable[..., DataFrame],
    param_grid: dict[str, Sequence],
    *,
    label_col: str = "label",
    code_col: str = "code",
    parallelism: int = 1,
) -> tuple[dict, float, list[tuple[dict, float]]]:
    """Evaluate every parameter combination of ``check_builder(df,
    **params) -> df+code`` by F1; returns (best_params, best_f1,
    all_results). The input is cached so the grid re-reads memory, not
    storage — the distributed analogue of GridSearchCV over
    AnomalyDetectorWrapper. ``parallelism > 1`` submits candidates as
    concurrent Spark jobs from driver threads (Spark's scheduler
    interleaves their stages across the cluster)."""
    df = df.cache()
    try:
        names = list(param_grid)
        combos = [dict(zip(names, c))
                  for c in itertools.product(*(param_grid[n] for n in names))]

        def evaluate(params):
            scored = check_builder(df, **params)
            return params, f1_score(scored, code_col=code_col,
                                    label_col=label_col)

        if parallelism > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=parallelism) as pool:
                results = list(pool.map(evaluate, combos))
        else:
            results = [evaluate(p) for p in combos]
        best_params, best_f1 = max(results, key=lambda r: r[1])
        return best_params, best_f1, results
    finally:
        df.unpersist()
