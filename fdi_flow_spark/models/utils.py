"""Driver-side plotting of simulation results (reference
``fdi_flow/models/utils.py:4-53`` — 3-panel inputs/outputs/states plot).
Works from either the reference dict shape or a step-row DataFrame
(collected via ``toPandas``). Matplotlib is optional."""

from __future__ import annotations

import numpy as np


def plot_simulation_results(result, title: str = "Simulation results"):
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # matplotlib not installed in this environment
        raise NotImplementedError("plotting requires matplotlib") from e

    if not isinstance(result, dict):  # step-row DataFrame -> dict
        pdf = result.toPandas().sort_values("step")
        result = {
            "time": pdf["t"].to_numpy(),
            "states": np.vstack(pdf["states"].to_numpy()),
            "outputs": np.vstack(pdf["outputs"].to_numpy()),
            "inputs": np.vstack(pdf["inputs"].to_numpy()),
        }
    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    for j in range(result["inputs"].shape[1]):
        axes[0].plot(result["time"], result["inputs"][:, j], label=f"u{j+1}")
    axes[0].set_ylabel("inputs")
    axes[0].legend()
    for j in range(result["outputs"].shape[1]):
        axes[1].plot(result["time"], result["outputs"][:, j], label=f"y{j+1}")
    axes[1].set_ylabel("outputs")
    axes[1].legend()
    for j in range(result["states"].shape[1]):
        axes[2].plot(result["time"], result["states"][:, j], label=f"x{j+1}")
    axes[2].set_ylabel("states")
    axes[2].set_xlabel("time")
    axes[2].legend()
    fig.suptitle(title)
    return fig
