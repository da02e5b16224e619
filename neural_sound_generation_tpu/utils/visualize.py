"""Codebook / embedding visualization.

Rebuilds ``visualize_embedding`` (src/util.py:78-83): the reference
projects the VQ codebook to 2-D with UMAP and scatters it. UMAP is not in
this image, so the default projector is PCA (same call surface, same
artifact); the projection function is pluggable.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def project_codebook_2d(
    codebook: np.ndarray, projector: Optional[Callable] = None
) -> np.ndarray:
    """(K, D) codebook -> (K, 2) scatter coordinates."""
    codebook = np.asarray(codebook, np.float64)
    if projector is not None:
        return np.asarray(projector(codebook))
    from sklearn.decomposition import PCA

    return PCA(n_components=2).fit_transform(codebook)


def visualize_embedding(
    codebook: np.ndarray,
    out_path: str,
    projector: Optional[Callable] = None,
    title: str = "codebook",
):
    """Write a 2-D scatter of the codebook to ``out_path`` (png)."""
    coords = project_codebook_2d(codebook, projector)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(coords[:, 0], coords[:, 1], s=8, alpha=0.7)
    ax.set_title(f"{title} ({codebook.shape[0]} codes)")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return coords
