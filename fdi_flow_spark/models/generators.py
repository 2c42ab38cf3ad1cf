"""Distributed simulation: a config DataFrame fans simulations out across
executors; each group runs the sequential NumPy integrator (irreducible per
sim) and emits step rows. The scale axis is the number of simulations —
embarrassingly parallel, one Arrow hop per sim group.

Reference: ``DynamicSystemDataGenerator`` (``/root/reference/fdi_flow/models/
data_generators.py:3-90``): ``x0 ~ U(bounds)``; constant signal (uniform, or
normal with mean=(min+max)/2, sigma=(max-min)/6) or per-channel random sine
(amp/offset/phase drawn, fixed frequency). The reference draws from unseeded
``np.random``; here every draw is seeded per (seed, sim_id) so results are
reproducible and partition-order-independent — a documented improvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SIM_SCHEMA = StructType(
    [
        StructField("sim_id", LongType()),
        StructField("step", LongType()),
        StructField("t", DoubleType()),
        StructField("states", ArrayType(DoubleType())),
        StructField("outputs", ArrayType(DoubleType())),
        StructField("inputs", ArrayType(DoubleType())),
    ]
)


def simulate_batch(
    spark: SparkSession,
    model,
    x0_list,
    u_list,
    t_final: float = 10.0,
    dt: float = 0.01,
    method: str = "euler",
) -> DataFrame:
    """Run ``model.simulate`` for each (x0, u) pair, distributed by sim_id.

    ``model`` must be picklable (our model classes are; user callables in
    nonlinear models ride along in the closure).
    """
    configs = spark.createDataFrame(
        [
            (int(i), [float(v) for v in np.ravel(x0)], [[float(v) for v in row] for row in np.atleast_2d(u)])
            for i, (x0, u) in enumerate(zip(x0_list, u_list))
        ],
        schema="sim_id long, x0 array<double>, u array<array<double>>",
    )
    return _run_configs(configs, model, t_final, dt, method)


def _run_configs(configs: DataFrame, model, t_final, dt, method) -> DataFrame:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            x0 = np.array(row["x0"], dtype=float)
            u = np.array([np.array(r, dtype=float) for r in row["u"]])
            try:
                res = model.simulate(u=u, x0=x0, t_final=t_final, dt=dt, method=method)
            except TypeError:  # discrete models take no method/t_final pair
                res = model.simulate(u=u, x0=x0, dt=dt)
            n = len(res["time"])
            out.append(
                pd.DataFrame(
                    {
                        "sim_id": np.full(n, row["sim_id"], dtype=np.int64),
                        "step": np.arange(n, dtype=np.int64),
                        "t": res["time"],
                        "states": list(np.asarray(res["states"], dtype=float)),
                        "outputs": list(np.asarray(res["outputs"], dtype=float)),
                        "inputs": list(np.asarray(res["inputs"], dtype=float)),
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in SIM_SCHEMA.fields}
        )

    return configs.groupBy("sim_id").applyInPandas(fn, schema=SIM_SCHEMA)


class DynamicSystemDataGenerator:
    """Seeded, distributed analog of the reference generator.

    ``generate`` returns the step-row DataFrame; ``generate_local`` returns
    the reference's ``List[dict]`` shape for API parity / golden tests.
    """

    def __init__(self, model, x0_bounds, seed: int = 42):
        self.model = model
        self.x0_bounds = x0_bounds
        self.seed = seed

    def _draw(self, sim_id: int, signal_type: str, signal_params, t_final, dt):
        rng = np.random.default_rng((self.seed, sim_id))
        x0_low = np.array(self.x0_bounds[0], dtype=float)
        x0_high = np.array(self.x0_bounds[1], dtype=float)
        x0 = rng.uniform(x0_low, x0_high)
        n_steps = int(t_final / dt)
        signal_params = signal_params or {}
        m = getattr(self.model, "m", signal_params.get("input_dim", 1))
        if signal_type == "constant":
            dist = signal_params.get("distribution", "uniform")
            lo = signal_params.get("min_val", -1.0)
            hi = signal_params.get("max_val", 1.0)
            if dist == "uniform":
                u_val = rng.uniform(lo, hi, size=(m,))
            else:
                u_val = rng.normal(loc=(lo + hi) / 2, scale=(hi - lo) / 6, size=(m,))
            u = np.tile(u_val, (n_steps, 1))
        elif signal_type == "sine":
            amp_r = signal_params.get("amplitude_range", (0.5, 1.0))
            off_r = signal_params.get("offset_range", (-1.0, 1.0))
            ph_r = signal_params.get("phase_range", (0, 2 * np.pi))
            freq = signal_params.get("frequency", 1.0)
            time = np.linspace(0, t_final, n_steps)
            u = np.zeros((n_steps, m))
            for j in range(m):
                amp = rng.uniform(*amp_r)
                off = rng.uniform(*off_r)
                phase = rng.uniform(*ph_r)
                u[:, j] = off + amp * np.sin(2 * np.pi * freq * time + phase)
        else:
            raise ValueError(f"Unsupported signal type: {signal_type}")
        return x0, u

    def generate(
        self,
        spark: SparkSession,
        num_simulations: int,
        signal_type: str = "constant",
        signal_params: dict | None = None,
        t_final: float = 10.0,
        dt: float = 0.01,
        method: str = "euler",
    ) -> DataFrame:
        draws = [
            self._draw(i, signal_type, signal_params, t_final, dt)
            for i in range(num_simulations)
        ]
        return simulate_batch(
            spark,
            self.model,
            [d[0] for d in draws],
            [d[1] for d in draws],
            t_final,
            dt,
            method,
        )

    def generate_local(
        self,
        num_simulations: int,
        signal_type: str = "constant",
        signal_params: dict | None = None,
        t_final: float = 10.0,
        dt: float = 0.01,
    ):
        results = []
        for i in range(num_simulations):
            x0, u = self._draw(i, signal_type, signal_params, t_final, dt)
            try:
                results.append(self.model.simulate(u=u, x0=x0, t_final=t_final, dt=dt))
            except TypeError:
                results.append(self.model.simulate(u=u, x0=x0, dt=dt))
        return results


def simulate_replay(df: DataFrame, sim_fn) -> DataFrame:
    """Replay a simulation kernel over TABLE-RESIDENT inputs: ``df`` is
    ``(series_id, step, u ARRAY<DOUBLE>)``; each series' ordered input rows
    drive one ``sim_fn(u_matrix) -> {'states', 'outputs'}`` call on an
    executor — the scale axis is the number of series, and the inputs never
    pass through the driver (contrast ``simulate_batch``, whose u/x0
    configs originate driver-side). ``sim_fn`` must be picklable
    (cloudpickle ships lambdas/closures fine).

    Output: ``(series_id, step, x ARRAY<DOUBLE>, y ARRAY<DOUBLE>)``.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("series_id", StringType()),
            StructField("step", LongType()),
            StructField("x", ArrayType(DoubleType())),
            StructField("y", ArrayType(DoubleType())),
        ]
    )

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("step")
        u = np.array([list(map(float, row)) for row in pdf["u"]])
        sim = sim_fn(u)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].to_numpy(),
                "step": pdf["step"].to_numpy(),
                "x": [row.tolist() for row in sim["states"]],
                "y": [row.tolist() for row in sim["outputs"]],
            }
        )

    return df.groupBy("series_id").applyInPandas(fn, schema)


def simulate_discrete_replay(df: DataFrame, model, x0) -> DataFrame:
    """M2 wrapper over :func:`simulate_replay` (reference discrete
    conventions: post-update state, pre-update output —
    /root/reference/fdi_flow/models/linear_models.py:132-140)."""
    x0 = np.array(x0, dtype=float)
    return simulate_replay(df, lambda u: model.simulate(u, x0))
