"""NumPy golden kernels re-implemented from the recorded reference formulas
(SURVEY.md §2; citations in each docstring point at /root/reference). These
are the test oracles for the ops whose semantics aren't SQL-expressible.
They are written from the documented recurrences, not copied code.
"""

from collections import Counter

import numpy as np


def ref_moving_average(x: np.ndarray, W: int, pad_with_zeros: bool) -> np.ndarray:
    """filters.py:151-174 — valid convolution or edge-padded same-length."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < W:
        return x.copy()
    if not pad_with_zeros:
        return np.convolve(x, np.ones(W) / W, mode="valid")
    pad = (W - 1) // 2
    pl, pr = (pad, pad + 1) if W % 2 == 0 else (pad, pad)
    padded = np.pad(x, (pl, pr), mode="edge")
    return np.convolve(padded, np.ones(W) / W, mode="valid")[: len(x)]


def ref_median_filter(x: np.ndarray, W: int, pad_with_zeros: bool) -> np.ndarray:
    """filters.py:219-230 — centered median over padded series."""
    x = np.asarray(x, dtype=np.float64)
    pad = W // 2
    if pad_with_zeros:
        padded = np.pad(x, (pad,), mode="constant", constant_values=0)
    else:
        padded = np.pad(x, (pad,), mode="edge")
    return np.array([np.median(padded[i : i + W]) for i in range(len(x))])


def ref_ewma(x: np.ndarray, alpha: float) -> np.ndarray:
    """filters.py:69-74."""
    out = np.zeros_like(np.asarray(x, dtype=np.float64))
    out[0] = x[0]
    for i in range(1, len(x)):
        out[i] = alpha * x[i] + (1 - alpha) * out[i - 1]
    return out


def ref_holt(x: np.ndarray, alpha: float, beta: float) -> np.ndarray:
    """filters.py:106-119 — returns level + trend."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2:
        return x.copy()
    level, trend = np.zeros(n), np.zeros(n)
    level[0] = x[0]
    trend[0] = x[1] - x[0]
    for i in range(1, n):
        level[i] = alpha * x[i] + (1 - alpha) * (level[i - 1] + trend[i - 1])
        trend[i] = beta * (level[i] - level[i - 1]) + (1 - beta) * trend[i - 1]
    return level + trend


def ref_kalman1d(x, q, r, x0, p0):
    """filters.py:332-356."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n == 0:
        return x.copy()
    s = x[0] if x0 is None else x0
    p = p0
    out = np.zeros(n)
    out[0] = s
    for i in range(1, n):
        p_pred = p + q
        k = p_pred / (p_pred + r)
        s = s + k * (x[i] - s)
        p = (1 - k) * p_pred
        out[i] = s
    return out


def ref_bandpass(x, low, high, sr):
    """filters.py:275-285."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0:
        return x.copy()
    fft = np.fft.fft(x)
    freqs = np.fft.fftfreq(len(x), d=1.0 / sr)
    fft[(np.abs(freqs) < low) | (np.abs(freqs) > high)] = 0
    return np.real(np.fft.ifft(fft))


def ref_standard_scale(x, with_mean=True, with_std=True):
    """scalers.py:65-77 — population std, skip divide on zero std."""
    out = np.asarray(x, dtype=np.float64).copy()
    if with_mean:
        out -= np.mean(out)
    if with_std:
        std = np.std(out)
        if std > 0:
            out /= std
    return out


def ref_minmax_scale(x, lo=0.0, hi=1.0):
    """scalers.py:103-116 — constant series -> midpoint fill."""
    x = np.asarray(x, dtype=np.float64)
    dmin, dmax = np.min(x), np.max(x)
    if dmax - dmin == 0:
        return np.full_like(x, (lo + hi) / 2)
    return (x - dmin) / (dmax - dmin) * (hi - lo) + lo


def ref_robust_scale(x, with_centering=True, with_scaling=True):
    """scalers.py:142-158 — median / IQR via linear-interp percentiles."""
    out = np.asarray(x, dtype=np.float64).copy()
    if with_centering:
        out -= np.median(out)
    if with_scaling:
        q75, q25 = np.percentile(out, [75, 25])
        if q75 - q25 > 0:
            out /= q75 - q25
    return out


def ref_segment_starts(n: int, W: int, step: int, drop_last: bool) -> list[int]:
    """segmenters.py:78-89 — emitted window starts, incl. the tail quirk."""
    starts = list(range(0, n - W + 1, step))
    if not starts:
        return starts
    last = starts[-1]
    if not drop_last and (n - last - step) > 0:
        starts.append(n - W)
    return starts


def ref_failure_encode(x, threshold):
    """segmenters.py:278-287 (Counter tie-break replaced by (cnt,-value))."""
    x = np.asarray(x, dtype=np.float64)
    nz = x[x != 0]
    if len(nz) == 0:
        return 0.0
    if 100.0 * len(nz) / len(x) >= threshold:
        counts = Counter(nz)
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        return float(best[0])
    return 0.0


def ref_resample_linear(x, target):
    x = np.asarray(x, dtype=np.float64)
    xo = np.linspace(0, 1, len(x))
    xn = np.linspace(0, 1, target)
    return np.interp(xn, xo, x)


def ref_resample_nearest(x, target):
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    pos = np.linspace(0, 1, target) * (n - 1) if target > 1 else np.array([0.0])
    idx = np.ceil(pos - 0.5).astype(int).clip(0, n - 1)  # ties round down
    return x[idx]
