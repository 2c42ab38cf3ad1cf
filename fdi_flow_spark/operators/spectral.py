"""Per-window spectral feature extraction — the frequency-domain features
an FDI practitioner feeds to the §2.7 detectors (band energies, dominant
frequency, spectral entropy per sliding window).

Extends the reference's frequency-domain surface (``BandpassFilter``,
``/root/reference/fdi_flow/preprocessing/filters.py:241-293``) from
filtering to featurization: segment (G1 machinery) -> batched real FFT.
The FFT runs in ONE Arrow-batched ``mapInPandas`` pass over the packed
window rows — windows from any series mix freely in a batch (row-wise
independent), and ``np.fft.rfft`` executes across the whole batch matrix at
once, so the Python step is a vectorized O(batch * W log W), not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from fdi_flow_spark.operators.segmenters import segment


def spectral_features_numpy(
    mat: np.ndarray, sample_rate: float, n_bands: int
) -> dict[str, np.ndarray]:
    """Batch kernel: rows = windows. Power spectrum over positive bins
    (DC excluded), equal-width band energy fractions, dominant frequency
    (Hz, argmax bin; ties -> lowest), normalized spectral entropy."""
    W = mat.shape[1]
    spec = np.abs(np.fft.rfft(mat, axis=1)) ** 2
    pos = spec[:, 1:]  # drop DC: features describe oscillation, not level
    n_bins = pos.shape[1]
    total = pos.sum(axis=1)
    safe_total = np.where(total > 0, total, 1.0)
    edges = np.linspace(0, n_bins, n_bands + 1).astype(int)
    bands = np.stack(
        [pos[:, edges[i] : edges[i + 1]].sum(axis=1) / safe_total for i in range(n_bands)],
        axis=1,
    )
    freqs = np.fft.rfftfreq(W, d=1.0 / sample_rate)[1:]
    dom = freqs[np.argmax(pos, axis=1)]
    p = pos / safe_total[:, None]
    if n_bins == 1:
        # a single positive bin carries no spectral uncertainty; the
        # normalizer log(n_bins) would be 0 -> 0/0 NaN
        ent = np.zeros(mat.shape[0])
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = -np.where(p > 0, p * np.log(p), 0.0).sum(axis=1) / np.log(n_bins)
    flat = total <= 0
    bands[flat] = 0.0
    dom[flat] = 0.0
    ent[flat] = 0.0
    return {
        "band_energy": bands,
        "dominant_freq": dom,
        "spectral_entropy": ent,
        "total_power": total,
    }


def spectral_features(
    df: DataFrame,
    window_size: int = 64,
    step: int = 32,
    sample_rate: float = 1.0,
    n_bands: int = 4,
) -> DataFrame:
    """Sliding-window spectral features per series. Output one row per
    window: ``(series_id, window_id, window_start, band_energy
    ARRAY<DOUBLE>[n_bands], dominant_freq, spectral_entropy, total_power)``.

    ``band_energy`` fractions sum to 1 per non-flat window; flat windows
    (zero AC power) emit zeros. Segmentation reuses the G1 operator
    (one Exchange), so this composes with every other series op.
    """
    if n_bands < 1:
        raise ValueError("n_bands must be >= 1")
    if window_size < 2 * n_bands:
        raise ValueError("window_size must be >= 2 * n_bands (need >= 1 bin per band)")
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    packed = segment(df, window_size, step=step, drop_last=True)

    schema = (
        "series_id string, window_id long, window_start long, "
        "band_energy array<double>, dominant_freq double, "
        "spectral_entropy double, total_power double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["features"].to_numpy())
            feats = spectral_features_numpy(mat, sample_rate, n_bands)
            yield pd.DataFrame(
                {
                    "series_id": pdf["series_id"].to_numpy(),
                    "window_id": pdf["window_id"].to_numpy(),
                    "window_start": pdf["window_start"].to_numpy(),
                    "band_energy": list(feats["band_energy"]),
                    "dominant_freq": feats["dominant_freq"],
                    "spectral_entropy": feats["spectral_entropy"],
                    "total_power": feats["total_power"],
                }
            )

    return packed.select(
        "series_id", "window_id", "window_start", "features"
    ).mapInPandas(fn, schema=schema)
