"""Training-curve plots (ELBO / KL / BCE, train vs validation, SVG).

Output parity with /root/reference/src/plot_helper.py:16-110, including the
legend-placement heuristic: compare best-fit slopes of the first and second
halves of the training series (dropping the first two epochs) to pick the
quadrant least likely to cover the curves.
"""

from __future__ import annotations

import math
import os

import numpy as np

# result-row column indices (src/result_columns.py:4-8)
COL_EPOCH, COL_ELBO, COL_BCE, COL_KL = 0, 1, 2, 3


def legend_location(series: np.ndarray) -> str:
    series = np.asarray(series, dtype=float)[2:]
    half = math.ceil(len(series) / 2.0)
    if half <= 1:
        return "upper center"
    y1 = series[:half]
    y2 = series[-half:]
    x = np.arange(half, dtype=float)
    denom = len(x) * np.sum(x * x) - np.sum(x) ** 2
    m1 = (len(x) * np.sum(x * y1) - np.sum(x) * np.sum(y1)) / denom
    m2 = (len(x) * np.sum(x * y2) - np.sum(x) * np.sum(y2)) / denom
    vertical = "upper" if m1 < m2 else "lower"
    horizontal = "right" if abs(m1) > abs(m2) else "left"
    return f"{vertical} {horizontal}"


def _plot_one(title: str, y_label: str, train_data, val_data,
              output_dir: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.plot(train_data, color="b", label="Training")
    plt.plot(val_data, color="g", label="Validation")
    plt.title(title)
    plt.ylabel(y_label)
    plt.xlabel("Epoch")
    plt.legend(["Training", "Validation"], loc=legend_location(train_data))
    plt.grid()
    plt.savefig(os.path.join(output_dir, title.replace(" ", "_") + ".svg"))
    plt.close()


def basic_run_plot(train_results, val_results, output_dir: str) -> None:
    train = np.asarray(train_results, dtype=float)
    val = np.asarray(val_results, dtype=float)
    _plot_one("ELBO", "ELBO", train[:, COL_ELBO], val[:, COL_ELBO], output_dir)
    _plot_one("KL Divergence", "KL Divergence", train[:, COL_KL],
              val[:, COL_KL], output_dir)
    _plot_one("BCE Loss", "BCE Loss", train[:, COL_BCE], val[:, COL_BCE],
              output_dir)
