"""Diagnostic plots for FGVC training.

Counterpart of the reference's
get_a_plot_of_num_samples_per_class_vs_class_accuracy
(fgvc/util.py:112-135): a scatter of per-class sample counts against
per-class accuracy, written as a PNG per epoch.  The reference keeps its
call sites commented out (fgvc/train.py:363-364,376-377); here it runs
behind the --plot_per_class_acc flag so the tail-class diagnostic is usable
without editing source.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict


def plot_samples_per_class_vs_accuracy(
    num_samples_per_class: Dict[int, int],
    class_accuracies: Dict[int, float],
    epoch: int,
    output_folder: str,
):
    """Scatter samples-per-class (x) vs class accuracy (y); returns the
    figure and saves num_samples_per_class_vs_class_accuracy_epoch_{N}.png.

    Both dicts are aligned by sorted class key (the reference sorts both and
    plots values positionally — same here)."""
    import matplotlib

    matplotlib.use("Agg")  # headless TPU hosts
    import matplotlib.pyplot as plt

    Path(output_folder).mkdir(parents=True, exist_ok=True)
    xs = [v for _, v in sorted(num_samples_per_class.items())]
    ys = [v for _, v in sorted(class_accuracies.items())]

    fig, ax = plt.subplots()
    ax.set_xlabel("Number of samples per class")
    ax.set_ylabel("Class accuracy", color="tab:blue")
    ax.scatter(xs, ys, color="tab:blue")
    ax.tick_params(axis="y", labelcolor="tab:blue")
    fig.tight_layout()
    out = Path(output_folder) / f"num_samples_per_class_vs_class_accuracy_epoch_{epoch}.png"
    fig.savefig(out)
    logging.info("per-class accuracy plot: %s", out)
    return fig
