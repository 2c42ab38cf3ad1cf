"""Structured Streaming variants of the stateful operators.

The reference hints at streaming reuse via ``KalmanFilter.reset()``
(``/root/reference/fdi_flow/preprocessing/filters.py:358-361``) and the
observers' one-``step``-per-sample APIs (``state_observers/*.py``); it has no
actual streaming runtime. Here each recurrence becomes an
``applyInPandasWithState`` operator keyed by ``series_id``: the carried state
is exactly the recurrence's O(1)/O(n²) state (EWMA: s; KF1D: x,p; matrix
observer: x̂ flattened), so batch replay ≡ streaming replay — asserted in
``tests/test_streaming.py``.

Windowed segmentation maps to event-time sliding windows with a watermark
(Spark's native late-data semantics; the reference has none, so watermark
choice is engine-defined).

Batches must arrive time-ordered per series for bit-equality with batch
replay (the contract of any incremental recurrence); out-of-order *within* a
micro-batch is handled by sorting on ``ts``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
    ]
)


def streaming_ewma(df: DataFrame, alpha: float) -> DataFrame:
    """EWMA over a stream of (series_id, ts, value). State: last smoothed s."""
    state_schema = StructType([StructField("s", DoubleType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        s = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            vals = pdf["value"].to_numpy(dtype=np.float64)
            res = np.empty(len(vals))
            for i, x in enumerate(vals):
                s = x if s is None else alpha * x + (1 - alpha) * s
                res[i] = s
            out.append(
                pd.DataFrame(
                    {"series_id": key[0], "ts": pdf["ts"].to_numpy(), "value": res}
                )
            )
        state.update((float(s),))
        yield pd.concat(out)

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_kalman_1d(
    df: DataFrame, q: float = 1.0, r: float = 1.0, x0: float | None = None, p0: float = 1.0
) -> DataFrame:
    """Scalar random-walk Kalman filter (reference F6) over a stream.
    State: (x, p, started)."""
    state_schema = StructType(
        [StructField("x", DoubleType()), StructField("p", DoubleType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            x, p = state.get
            started = True
        else:
            x, p, started = None, p0, False
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            vals = pdf["value"].to_numpy(dtype=np.float64)
            res = np.empty(len(vals))
            for i, z in enumerate(vals):
                if not started:
                    x = z if x0 is None else x0
                    started = True
                else:
                    p_pred = p + q
                    k = p_pred / (p_pred + r)
                    x = x + k * (z - x)
                    p = (1 - k) * p_pred
                res[i] = x
            out.append(
                pd.DataFrame(
                    {"series_id": key[0], "ts": pdf["ts"].to_numpy(), "value": res}
                )
            )
        state.update((float(x), float(p)))
        yield pd.concat(out)

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_holt(df: DataFrame, alpha: float = 0.3, beta: float = 0.1) -> DataFrame:
    """Holt double-exponential smoothing (reference F2) over a stream.

    The batch kernel initializes ``trend[0] = x[1] - x[0]`` — a one-sample
    LOOK-AHEAD — so the first input row cannot be emitted until the second
    arrives: it rides in state as a pending sample and both outputs are
    emitted together (possibly in a later micro-batch than the first row's
    arrival; append mode permits that). Bit-equal to the batch operator for
    series with >= 2 samples — a 1-sample stream never emits (the batch op
    returns it unchanged, which a stream cannot know to do).
    State: (pending_ts, pending_x, level, trend, phase).
    """
    state_schema = StructType(
        [
            StructField("pts", LongType()),
            StructField("px", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("phase", LongType()),  # 0=empty, 1=pending, 2=running
        ]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            pts, px, level, trend, phase = state.get
        else:
            pts, px, level, trend, phase = 0, 0.0, 0.0, 0.0, 0
        out_ts, out_v = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, x in zip(pdf["ts"].to_numpy(), pdf["value"].to_numpy(np.float64)):
                if phase == 0:
                    pts, px, phase = int(ts), float(x), 1
                elif phase == 1:
                    level, trend = px, x - px  # level[0]=x0, trend[0]=x1-x0
                    out_ts.append(pts)
                    out_v.append(level + trend)
                    prev_level = level
                    level = alpha * x + (1 - alpha) * (level + trend)
                    trend = beta * (level - prev_level) + (1 - beta) * trend
                    out_ts.append(int(ts))
                    out_v.append(level + trend)
                    phase = 2
                else:
                    prev_level = level
                    level = alpha * x + (1 - alpha) * (level + trend)
                    trend = beta * (level - prev_level) + (1 - beta) * trend
                    out_ts.append(int(ts))
                    out_v.append(level + trend)
        state.update((int(pts), float(px), float(level), float(trend), int(phase)))
        yield pd.DataFrame(
            {"series_id": key[0], "ts": out_ts, "value": out_v}
        ) if out_ts else pd.DataFrame({"series_id": [], "ts": [], "value": []})

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


_CUSUM_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)


def streaming_cusum(
    df: DataFrame, k: float, h: float, target: float
) -> DataFrame:
    """Two-sided CUSUM over a stream of (series_id, ts, value) — the online
    deployment of ``operators.drift.cusum``. State: the pair (S+, S-) —
    exactly the O(1) recursion state, so batch (reflected prefix sum) ≡
    streaming (textbook recursion) bit-for-bit; the parity test doubles as
    a proof of the reflection identity the batch rewrite relies on.

    ``target`` must be explicit here: the batch default (per-series mean)
    is a two-pass statistic a stream cannot know. Fit it offline, deploy it
    online — the scaler/TF-IDF fit/score pattern."""
    state_schema = StructType(
        [StructField("sp", DoubleType()), StructField("sn", DoubleType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        sp, sn = state.get if state.exists else (0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            vals = pdf["value"].to_numpy(dtype=np.float64)
            pos = np.empty(len(vals))
            neg = np.empty(len(vals))
            for i, x in enumerate(vals):
                sp = max(0.0, sp + (x - target - k))
                sn = max(0.0, sn + (target - x - k))
                pos[i] = sp
                neg[i] = sn
            out.append(
                pd.DataFrame(
                    {
                        "series_id": key[0],
                        "ts": pdf["ts"].to_numpy(),
                        "value": vals,
                        "cusum_pos": pos,
                        "cusum_neg": neg,
                        "alarm": (pos > h) | (neg > h),
                    }
                )
            )
        state.update((float(sp), float(sn)))
        yield pd.concat(out)

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _CUSUM_OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


_PH_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("ph_stat", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)


def streaming_page_hinkley(df: DataFrame, delta: float, lam: float) -> DataFrame:
    """Page–Hinkley over a stream — the online twin of
    ``operators.drift.page_hinkley``. State: (count, running sum, m, min m)
    — O(1) per series; the running mean continues exactly where the last
    micro-batch left off, so batch ≡ streaming (float atol)."""
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("csum", DoubleType()),
            StructField("m", DoubleType()),
            StructField("mmin", DoubleType()),
        ]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, csum, m, mmin = state.get if state.exists else (0, 0.0, 0.0, np.inf)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            vals = pdf["value"].to_numpy(dtype=np.float64)
            ph = np.empty(len(vals))
            for i, x in enumerate(vals):
                n += 1
                csum += x
                m += x - csum / n - delta
                mmin = min(mmin, m)
                ph[i] = m - mmin
            out.append(
                pd.DataFrame(
                    {
                        "series_id": key[0],
                        "ts": pdf["ts"].to_numpy(),
                        "value": vals,
                        "ph_stat": ph,
                        "alarm": ph > lam,
                    }
                )
            )
        state.update((int(n), float(csum), float(m), float(mmin)))
        yield pd.concat(out)

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _PH_OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_dedup_exact(
    docs: DataFrame,
    time_col: str = "event_time",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup — the streaming analog of
    ``pipelines.dedup.exact_dedup``: first occurrence of each content digest
    is kept; re-arrivals within the watermark horizon are dropped, and the
    per-digest state expires once the watermark passes (bounded state — the
    property that lets this run forever at ingest scale; the batch op has no
    such horizon because it sees everything)."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


_OBS_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("step", LongType()),
        StructField("x_hat", ArrayType(DoubleType())),
    ]
)


def streaming_observer(df: DataFrame, observer_factory) -> DataFrame:
    """Streaming replay of a Luenberger observer over (series_id, step, u, y)
    rows. State: flattened x̂. The observer object is rebuilt per batch from
    the factory (gains are deterministic), the estimate rides in state."""
    state_schema = StructType([StructField("x_hat", ArrayType(DoubleType()))])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        obs = observer_factory()
        if state.exists:
            obs.x_hat = np.array(state.get[0], dtype=float).reshape(-1, 1)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("step")
            xs = []
            for _, row in pdf.iterrows():
                x = obs.update(np.array(row["u"], dtype=float), np.array(row["y"], dtype=float))
                xs.append(x.ravel().tolist())
            out.append(
                pd.DataFrame(
                    {"series_id": key[0], "step": pdf["step"].to_numpy(), "x_hat": xs}
                )
            )
        state.update(([float(v) for v in obs.x_hat.ravel()],))
        yield pd.concat(out)

    return df.groupBy("series_id").applyInPandasWithState(
        fn, _OBS_OUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_sessions(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's native
    ``session_window`` — the online analog of ``operators.analytics
    .sessionize`` (same boundary rule: events merge while gaps stay within
    ``gap``; state closes and emits once the watermark passes the session
    end, which is what bounds state at ingest scale). Output: one row per
    closed session ``(key, session_start, session_end, n_events)``.

    Works identically on a batch frame (used by the batch≡sessionize parity
    test — two independent kernels, one session definition)."""
    g = df
    if df.isStreaming:
        g = df.withWatermark(time_col, watermark)
    return (
        g.groupBy(F.col(key_col), F.session_window(F.col(time_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_segment_windows(
    df: DataFrame,
    window_duration: str = "10 seconds",
    slide_duration: str = "5 seconds",
    watermark: str = "30 seconds",
    time_col: str = "event_time",
) -> DataFrame:
    """Event-time sliding-window aggregation over a stream — the streaming
    analog of the batch segmenter (G1): per (series, window) collect count /
    mean / min / max. Late rows beyond the watermark are dropped (Spark
    semantics; the reference has no late-data story)."""
    return (
        df.withWatermark(time_col, watermark)
        .groupBy(
            F.col("series_id"),
            F.window(F.col(time_col), window_duration, slide_duration),
        )
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .select(
            "series_id",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "mean",
            "min",
            "max",
        )
    )
