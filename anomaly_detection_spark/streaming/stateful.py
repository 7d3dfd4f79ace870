"""Custom stateful streaming check: the reference's EMA recurrence
(/root/reference/src/algorithms/ema.py:88-126) carried ACROSS micro-
batches with ``applyInPandasWithState`` — the streaming analogue of
``sequential.ema_check``.

State per series key = (last_ema, count). Each micro-batch sorts its
rows by event time, folds them through the closed-form EMA continuation
(vectorized: EMA_t = (1-s)^t * E0 + s * sum (1-s)^(t-i) v_i), emits a
verdict per row, and stores the tail EMA back. A restarted query resumes
from Spark's state checkpoint — state handling is Spark's, not ours.

Semantics match the batch operator exactly when rows arrive in order
(the reference assumes in-order arrival, SURVEY.md §2.10); late rows
within a batch are ordered by the sort, late across batches follow
processing order like the reference would.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ema_state_fn(N: int, LL: float, UL: float,
                 warning_stages: Sequence[float] = ()):
    """Build the (key, batches, state) -> batches function for
    ``applyInPandasWithState``. Output rows: key, order, value, ema, code."""
    s = 2.0 / (N + 1)
    q = 1.0 - s
    mid, half = (UL + LL) / 2.0, (UL - LL) / 2.0
    stages = sorted(warning_stages)

    def fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        prev_ema, prev_n = state.get if state.exists else (float("nan"), 0)
        for pdf in batches:
            pdf = pdf.sort_values("order").reset_index(drop=True)
            v = pdf["value"].to_numpy(dtype=np.float64)
            t = np.arange(1, len(v) + 1, dtype=np.float64)
            if prev_n == 0:
                # first element seeds the EMA (reference: EMA_0 = v_0)
                ema = pd.Series(v).ewm(alpha=s, adjust=False).mean().to_numpy()
            else:
                # continuation: EMA_t = q^t * prev + s * sum q^(t-i) v_i
                contrib = np.power(q, -t) * v
                ema = np.power(q, t) * (prev_ema + s * np.cumsum(contrib))
            vn = (ema - mid) / half
            code = np.ones(len(v), dtype=np.int32)
            if stages:
                code[np.abs(vn) > stages[0]] = 0
            code[vn > 1.0] = -1
            code[vn < -1.0] = -1
            out = pdf[["key", "order"]].copy()
            out["value"] = v
            out["ema"] = ema
            out["code"] = code
            if len(v):
                prev_ema, prev_n = float(ema[-1]), prev_n + len(v)
            yield out
        state.update((prev_ema, prev_n))

    return fn


OUTPUT_SCHEMA = "key string, order double, value double, ema double, code int"
STATE_SCHEMA = "ema double, n long"


def streaming_ema_check(stream_df, *, N: int, LL: float, UL: float,
                        warning_stages: Sequence[float] = ()):
    """stream_df must have columns (key string, order double, value
    double). Returns the stateful per-row verdict stream."""
    return stream_df.groupBy("key").applyInPandasWithState(
        ema_state_fn(N, LL, UL, warning_stages),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
