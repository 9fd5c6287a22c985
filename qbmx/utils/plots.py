"""Matplotlib figure factories — parity with the reference plot surface
(``src/metrics.py:35-167``): loss/NLL per batch and per epoch, confusion
matrix, and the stacked output-distribution bars.  Kept in a separate module
so headless training never imports matplotlib."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _series_fig(series, title, xlabel, ylabel, color):
    fig, ax = plt.subplots()
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    n = len(series)
    ax.plot(np.linspace(1, n, n), series[:n], color=color)
    return fig


def get_loss_func_per_batch(history_per_batch, show_plot=False):
    fig = _series_fig(history_per_batch, "Average output node bias error per batch",
                      "Batch", "Average output node bias error", "orange")
    if show_plot:
        plt.show()
    return fig


def get_loss_func_per_epoch(history_per_epoch, show_plot=False):
    fig = _series_fig(history_per_epoch, "Average output node bias error per epoch",
                      "Epoch", "Average output node bias error", "purple")
    if show_plot:
        plt.show()
    return fig


def get_nll_func_per_batch(history_per_batch, show_plot=False):
    fig = _series_fig(history_per_batch, "Negative Log Likelihood per batch",
                      "Batch", "Negative Log Likelihood", "orange")
    if show_plot:
        plt.show()
    return fig


def get_nll_func_per_epoch(history_per_epoch, show_plot=False):
    fig = _series_fig(history_per_epoch, "Negative Log Likelihood per epoch",
                      "Epoch", "Negative Log Likelihood", "purple")
    if show_plot:
        plt.show()
    return fig


def get_confusion_matrix(y, y_predict, class_titles=None, show_plot=False):
    from sklearn.metrics import ConfusionMatrixDisplay, confusion_matrix

    classes = np.unique(np.concatenate((np.asarray(y), np.asarray(y_predict))))
    cm = confusion_matrix(y, y_predict, labels=classes)
    disp = ConfusionMatrixDisplay(
        confusion_matrix=cm,
        display_labels=classes if class_titles is None else class_titles,
    )
    fig, ax = plt.subplots()
    disp.plot(cmap=plt.cm.Blues, ax=ax)
    ax.set_title("Confusion Matrix for QBM Classifier")
    if show_plot:
        plt.show()
    return fig


def show_and_save_distribution(sorted_probs, x_ticks, file_path, title, legend_labels,
                               save=False):
    """Stacked probability bars over output-unit states (reference
    ``show_and_save_distribution``, ``src/metrics.py:131-167``)."""
    num_probs = len(sorted_probs)
    num_categories = len(sorted_probs[0])
    x_positions = np.arange(num_probs)
    stacked = np.asarray(sorted_probs).T
    colors = ["blue", "orange", "pink", "green"]
    bottom = np.zeros(num_probs)
    fig = plt.figure(figsize=(8, 6))
    for i in range(num_categories):
        plt.bar(
            x_positions, stacked[i], width=0.6,
            label=legend_labels[i] if i < len(legend_labels) else f"Category {i + 1}",
            bottom=bottom, color=colors[i % len(colors)],
        )
        bottom += stacked[i]
    plt.xticks(x_positions, x_ticks, rotation=45, ha="right")
    plt.xlabel("Time of Acquiring Distribution")
    plt.ylabel("Probability")
    plt.title(title)
    plt.ylim(0, 1.1)
    plt.legend(title="Output Units States", bbox_to_anchor=(1.05, 1), loc="upper left")
    plt.tight_layout()
    if file_path and save:
        plt.savefig(file_path, bbox_inches="tight")
    return fig


import dataclasses


@dataclasses.dataclass
class Plots:
    """Bundle of the five standard figures (reference ``Plots`` container,
    ``src/metrics.py:24-32``).  Build one with :func:`make_plots`; pass to
    :func:`save_all` or save/close fields individually."""

    conf_matrix_fig: object
    loss_per_batch_fig: object
    loss_per_epoch_fig: object
    nll_per_batch_fig: object
    nll_per_epoch_fig: object


def make_plots(history, y_true, y_predict, class_titles=None) -> Plots:
    """The reference assembles these five figures inline in ``save_result``
    (``src/metrics.py:225-231``); here they come as one container."""
    return Plots(
        conf_matrix_fig=get_confusion_matrix(y_true, y_predict, class_titles),
        loss_per_batch_fig=get_loss_func_per_batch(history.errors_per_batch),
        loss_per_epoch_fig=get_loss_func_per_epoch(history.error_per_epoch),
        nll_per_batch_fig=get_nll_func_per_batch(history.nll_per_batch),
        nll_per_epoch_fig=get_nll_func_per_epoch(history.nll_per_epoch),
    )


def save_all(file_path, history, y_true, y_predict, class_titles):
    """Write the reference's five figures next to a result file
    (``save_result``, ``src/metrics.py:225-231``)."""
    plots = make_plots(history, y_true, y_predict, class_titles)
    figs = {
        "_loss_per_iteration.png": plots.loss_per_batch_fig,
        "_loss_per_epoch.png": plots.loss_per_epoch_fig,
        "_nll_per_iteration.png": plots.nll_per_batch_fig,
        "_nll_per_epoch.png": plots.nll_per_epoch_fig,
        "_confusion_matrix.png": plots.conf_matrix_fig,
    }
    for suffix, fig in figs.items():
        fig.savefig(str(file_path) + suffix)
        plt.close(fig)


def seed_boxplot(groups: dict, title="best-epoch metric per seed",
                 ylabel="metric", show_plot=False):
    """Box plot of per-seed best-epoch metrics, one box per experiment group
    — the reference's multi-seed comparison figure
    (``src/paper_plots/boxplot_auc.png``, ``breast_box_combined_boxplot.png``;
    SURVEY §4.1: the sweep pickles exist "for box-plot comparison" but the
    plotting code was never committed).

    ``groups``: ``{label: [per-seed best values]}`` — e.g. each value
    ``max(acc_per_epoch)`` of one seed's pickle."""
    fig, ax = plt.subplots()
    labels = list(groups)
    ax.boxplot([np.asarray(groups[k], dtype=float) for k in labels],
               tick_labels=labels)
    ax.set_title(title)
    ax.set_ylabel(ylabel)
    ax.grid(True, axis="y", alpha=0.3)
    if show_plot:  # pragma: no cover - interactive
        plt.show()
    return fig


def seed_boxplot_from_pickles(folders, metric="acc", **kwargs):
    """Build :func:`seed_boxplot` groups from sweep output folders — each
    folder is one box, its per-seed ``*{metric}_per_epoch*.pkl`` series
    (the convention every qbmx sweep writer and the reference share,
    ``src/model/faster_dqbm.py:1161-1166``) reduced to the best epoch."""
    import pickle
    from pathlib import Path

    groups = {}
    for folder in folders:
        p = Path(folder)
        vals = []
        for f in sorted(p.glob(f"*{metric}_per_epoch*.pkl")):
            with open(f, "rb") as fh:
                series = pickle.load(fh)
            if series:
                vals.append(max(series))
        if not vals:
            raise FileNotFoundError(
                f"no *{metric}_per_epoch*.pkl with data under {p}")
        groups[p.name] = vals
    return seed_boxplot(groups, ylabel=f"best-epoch {metric}", **kwargs)
