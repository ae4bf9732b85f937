"""Evolution plots and qualitative overlap plots (seaborn/matplotlib,
artifact parity with ``src/utils/visualization.py``)."""

from __future__ import annotations

import matplotlib
matplotlib.use("Agg")  # headless
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns


def plot_evolution(df: pd.DataFrame, columns, path: str,
                   title: str = "Metric evolution", ylabel: str = "value",
                   xlabel: str = "Epoch") -> None:
    """Line plot of per-epoch metric columns (``visualization.py:63-89``)."""
    df_tmp = df[["epoch"] + list(columns)].melt(id_vars="epoch", var_name="linea",
                                                value_name="y")
    sns.set_style("whitegrid")
    plt.figure(figsize=(16, 8))
    sns.lineplot(data=df_tmp, x="epoch", y="y", hue="linea", palette="husl",
                 style="linea", markers=False, dashes=True)
    plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.legend(title="")
    plt.savefig(path)
    plt.close()


def plot_overlapping(image: np.ndarray, mask: np.ndarray, segmentation: np.ndarray,
                     path: str | None = None) -> None:
    """Image / GT / prediction / TP-FP-FN overlap panel (``visualization.py:9-60``)."""
    tp_color = [0, 1, 0]
    fp_color = [1, 0, 0]
    fn_color = [0, 0, 1]

    intersection = np.logical_and(mask, segmentation)
    fp = np.logical_and(segmentation, np.logical_not(mask))
    fn = np.logical_and(mask, np.logical_not(segmentation))

    result = np.zeros((mask.shape[0], mask.shape[1], 3))
    for ch in range(3):
        result[..., ch] = (fp_color[ch] * fp + fn_color[ch] * fn
                           + tp_color[ch] * intersection)

    legend_elements = [
        plt.Line2D([0], [0], color="w", marker="o", markerfacecolor=c,
                   markersize=16, label=lbl)
        for c, lbl in ((tp_color, "True Positive"), (fp_color, "False Positive"),
                       (fn_color, "False Negative"))]

    fig, axs = plt.subplots(1, 4, figsize=(25, 5))
    for ax, (img, ttl) in zip(axs, [(image, "Image"), (mask, "Mask"),
                                    (segmentation, "Segmentation"), (result, "Overlap")]):
        ax.imshow(img, cmap="gray" if ttl != "Overlap" else None)
        ax.set_title(ttl)
        ax.axis("off")
    plt.legend(handles=legend_elements, bbox_to_anchor=(0, 0), ncol=3, fontsize=24)
    if path:
        plt.savefig(path)
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()
