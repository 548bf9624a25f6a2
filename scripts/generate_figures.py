"""Generate README architecture/pipeline figures (matplotlib).

Equivalent of the reference's ``scripts/generate_readme_figures.py``
(SURVEY.md §2.1): renders the framework layer map and the whole-epoch
training pipeline to ``docs/``.

Usage: python scripts/generate_figures.py
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import FancyBboxPatch  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")


def _box(ax, x, y, w, h, label, color):
    ax.add_patch(FancyBboxPatch(
        (x, y), w, h, boxstyle="round,pad=0.02",
        facecolor=color, edgecolor="#333", linewidth=0.8))
    ax.text(x + w / 2, y + h / 2, label, ha="center", va="center",
            fontsize=8.5)


def architecture():
    fig, ax = plt.subplots(figsize=(9, 5.2))
    layers = [
        ("CLI / grid search  (main.py, cli.py)  —  log-format parity",
         "#dbeafe"),
        ("Trainers: whole-epoch lax.scan  +  custom loops "
         "(MMSSL / AdaGCL / Grade / DiffMM / MHRec / GFormer / BSPM)",
         "#dcfce7"),
        ("54-model zoo  (pytree models; params are explicit dicts)",
         "#fef9c3"),
        ("Shared kernels: norm-adj propagate (dense MXU / segment-sum) · "
         "kNN graphs · diffusion · kmeans · SVD · ODE · KAN · "
         "Pallas streaming-LSE", "#fee2e2"),
        ("Data: npy load · padded histories · on-device negative sampling",
         "#ede9fe"),
        ("JAX / XLA / Pallas on TPU   ·   jax.sharding Mesh (dp × mp)",
         "#e5e7eb"),
    ]
    for i, (label, color) in enumerate(layers):
        _box(ax, 0.04, 0.88 - i * 0.155, 0.92, 0.115, label, color)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.axis("off")
    ax.set_title("ChaoRec-TPU layer map", fontsize=12)
    fig.savefig(os.path.join(OUT, "architecture.png"), dpi=140,
                bbox_inches="tight")


def pipeline():
    fig, ax = plt.subplots(figsize=(10, 2.6))
    stages = [
        "shuffle edges\n(on device)",
        "sample negatives\n(vmapped bin-search)",
        "model.loss\n(value_and_grad)",
        "optax update\n(donated buffers)",
        "chunked eval\nbf16 score+mask+topk",
        "metrics kernel\n(ref parity)",
    ]
    for i, s in enumerate(stages):
        _box(ax, 0.02 + i * 0.165, 0.25, 0.14, 0.5, s, "#dbeafe")
        if i:
            ax.annotate("", xy=(0.02 + i * 0.165, 0.5),
                        xytext=(0.02 + i * 0.165 - 0.025, 0.5),
                        arrowprops=dict(arrowstyle="->"))
    ax.text(0.5, 0.93, "one jitted epoch — a single scalar returns to host",
            ha="center", fontsize=9, style="italic")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.axis("off")
    ax.set_title("Whole-epoch training pipeline", fontsize=12)
    fig.savefig(os.path.join(OUT, "pipeline.png"), dpi=140,
                bbox_inches="tight")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    architecture()
    pipeline()
    print(f"wrote {OUT}/architecture.png, {OUT}/pipeline.png")
