"""PCA feature reduction for motion features.

Rebuilds src/pca.py: ``run_pca`` (StandardScaler + sklearn PCA
fit_transform, pca.py:26-52) and ``run_pca_np`` (center + eigh of the
covariance, pca.py:12-24) — plus a fitted ``PCAProjector`` for *streaming*
projection, which the reference lacks (it re-fits and only keeps the
transformed training data, then multiplies incoming features by that
matrix, src/inference.py:149 — a latent shape bug: the product only works
when the frame count matches; here the projector applies the actual
learned components to each incoming frame).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import linalg as LA


def run_pca_np(x: np.ndarray) -> np.ndarray:
    """Center + eigendecomposition variant (pca.py:12-24): returns the
    data projected onto all principal axes, sorted by eigenvalue."""
    x = np.asarray(x, np.float64)
    x = x - np.mean(x, axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = LA.eigh(cov)
    idx = np.argsort(evals)[::-1]
    evecs = evecs[:, idx]
    return np.dot(x, evecs)


def run_pca(x: np.ndarray, n_components: int = 3) -> np.ndarray:
    """Standardize then PCA fit_transform (pca.py:26-52 semantics).
    Returns (n_samples, n_components)."""
    from sklearn import decomposition
    from sklearn.preprocessing import StandardScaler

    scaler = StandardScaler()
    x_std = scaler.fit_transform(np.asarray(x, np.float64))
    pca = decomposition.PCA(n_components)
    return pca.fit_transform(x_std)


@dataclasses.dataclass
class PCAProjector:
    """Fitted standardize+project transform for streaming frames."""

    mean: np.ndarray  # (D,)
    scale: np.ndarray  # (D,)
    components: np.ndarray  # (n_components, D)

    @classmethod
    def fit(cls, x: np.ndarray, n_components: int = 3) -> "PCAProjector":
        from sklearn import decomposition
        from sklearn.preprocessing import StandardScaler

        x = np.asarray(x, np.float64)
        scaler = StandardScaler().fit(x)
        x_std = scaler.transform(x)
        pca = decomposition.PCA(n_components).fit(x_std)
        return cls(
            mean=scaler.mean_,
            scale=scaler.scale_,
            components=pca.components_,
        )

    @property
    def n_components(self) -> int:
        return self.components.shape[0]

    def project(self, frames: np.ndarray) -> np.ndarray:
        """(N, D) or (D,) feature frames -> (N, n_components) latents."""
        frames = np.atleast_2d(np.asarray(frames, np.float64))
        x_std = (frames - self.mean) / self.scale
        return x_std @ self.components.T

    def save(self, path: str) -> None:
        np.savez(
            path, mean=self.mean, scale=self.scale, components=self.components
        )

    @classmethod
    def load(cls, path: str) -> "PCAProjector":
        data = np.load(path)
        return cls(
            mean=data["mean"], scale=data["scale"], components=data["components"]
        )


def load_pca(csv_path: str, n_components: int = 3) -> PCAProjector:
    """Fit a projector from a recorded joint-angle CSV — the
    inference-time bootstrap (src/inference.py:34-39 /
    src/MotionDataAnalysis.py). NOTE: the reference transposes the CSV
    before PCA (fitting over *feature* rows — pca over frames-as-
    dimensions); we fit over frames, the statistically meaningful axis,
    and document the divergence."""
    data = np.genfromtxt(csv_path, delimiter=",")
    if data.ndim == 1:
        data = data[None, :]
    return PCAProjector.fit(data, n_components)
