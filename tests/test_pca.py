"""PCA test matrix (the reference's test/test_pca.py is an Iris demo
script, not a test — SURVEY §4; the full PCA coverage lives in
test_motion.py, these are the named-matrix essentials)."""

import numpy as np

from neural_sound_generation_tpu.motion import PCAProjector, run_pca, run_pca_np


def test_eigenvector_norms(rng):
    """The one assertion pattern worth keeping from the reference demo
    (test_pca.py:68): principal axes are unit-norm."""
    x = rng.standard_normal((100, 6))
    proj = PCAProjector.fit(x, 3)
    norms = np.linalg.norm(proj.components, axis=1)
    np.testing.assert_array_almost_equal(norms, np.ones(3))


def test_variance_explained_ordering(rng):
    """Leading components capture non-increasing variance."""
    x = rng.standard_normal((200, 5)) * np.array([5.0, 3.0, 1.0, 0.5, 0.1])
    z = run_pca(x, 5)
    variances = z.var(axis=0)
    assert all(variances[i] >= variances[i + 1] - 1e-9 for i in range(4))


def test_numpy_and_sklearn_variants_agree_up_to_sign(rng):
    x = rng.standard_normal((80, 4))
    # standardize manually so both operate on the same input
    xs = (x - x.mean(0)) / x.std(0)
    a = run_pca_np(xs.copy())[:, :2]
    b = run_pca(x, 2)
    for k in range(2):
        corr = np.corrcoef(a[:, k], b[:, k])[0, 1]
        assert abs(corr) > 0.99  # same axes up to sign
