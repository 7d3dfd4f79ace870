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


def welford_state_fn(X: float, warning_stages: Sequence[float] = ()):
    """Streaming Welford check across micro-batches: state = the engine's
    mergeable (count, mean, M2) moments (sketches.welford_merge powers
    the cross-batch continuation exactly like the audit sketches). Each
    row is scored against the statistics of all PRIOR rows
    (/root/reference/src/algorithms/welford.py:176-191 semantics: rows
    0 and 1 Undefined, then vn = (v-mean)/(X*stddev_pop))."""
    from anomaly_detection_spark.sketches import welford_merge

    stages = sorted(warning_stages)

    def fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n0, mean0, m20 = state.get if state.exists else (0.0, 0.0, 0.0)
        for pdf in batches:
            pdf = pdf.sort_values("order").reset_index(drop=True)
            v = pdf["value"].to_numpy(dtype=np.float64)
            # Row i's verdict uses all PRIOR rows (state + batch[0:i]).
            # Vectorized prefix moments: counts/sums/sumsqs via cumsum,
            # shifted by one so the current row is excluded.
            cs = np.concatenate(([0.0], np.cumsum(v)[:-1]))
            cq = np.concatenate(([0.0], np.cumsum(v * v)[:-1]))
            cnt = n0 + np.arange(len(v), dtype=np.float64)
            s0 = n0 * mean0
            q0 = m20 + (n0 * mean0 * mean0 if n0 > 0 else 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                mean_prior = (s0 + cs) / cnt
                m2_prior = np.maximum(
                    (q0 + cq) - (s0 + cs) ** 2 / np.where(cnt > 0, cnt, 1.0),
                    0.0,
                )
                sd = np.sqrt(np.where(cnt > 0, m2_prior / np.where(cnt > 0, cnt, 1.0), 0.0))
                vn = np.where(sd > 0, (v - mean_prior) / (X * sd), np.inf)
            codes = np.ones(len(v), dtype=np.int32)
            if stages:
                codes[np.abs(vn) > stages[0]] = 0
            codes[(vn > 1.0) | (vn < -1.0)] = -1
            codes[cnt <= 1] = 2
            # fold the whole batch into the carried moments (exact merge)
            if len(v):
                bn = float(len(v))
                bmean = float(v.mean())
                bm2 = float(((v - bmean) ** 2).sum())
                n0, mean0, m20 = welford_merge((n0, mean0, m20),
                                               (bn, bmean, bm2))
            out = pdf[["key", "order"]].copy()
            out["value"] = v
            out["code"] = codes
            yield out
        state.update((float(n0), float(mean0), float(m20)))

    return fn


WELFORD_OUTPUT_SCHEMA = "key string, order double, value double, code int"
WELFORD_STATE_SCHEMA = "n double, mean double, m2 double"


def streaming_welford_check(stream_df, *, X: float,
                            warning_stages: Sequence[float] = ()):
    """stream_df columns: (key string, order double, value double)."""
    return stream_df.groupBy("key").applyInPandasWithState(
        welford_state_fn(X, warning_stages),
        outputStructType=WELFORD_OUTPUT_SCHEMA,
        stateStructType=WELFORD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
