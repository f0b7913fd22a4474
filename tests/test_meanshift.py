"""Mean-shift clustering: blobs collapse to their modes; labels group
correctly; confidence weights pull modes toward high-weight samples."""
import numpy as np
import jax.numpy as jnp

from rslo_tpu.geometry.meanshift import (label_modes, mean_shift,
                                         mean_shift_cluster)


def _blobs(rng, centers, n=60, std=0.2):
    pts = np.concatenate([
        c + std * rng.normal(size=(n, len(c))) for c in centers])
    return pts.astype(np.float32)


def test_modes_converge_to_blob_centers(rng):
    centers = np.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0],
                        [0.0, 6.0, 0.0]])
    pts = _blobs(rng, centers)
    modes, labels = mean_shift_cluster(jnp.asarray(pts), bandwidth=1.0,
                                       iters=20, tol=0.5)
    modes, labels = np.asarray(modes), np.asarray(labels)
    assert len(np.unique(labels)) == 3
    for k, c in enumerate(centers):
        grp = modes[labels == labels[k * 60]]
        assert len(grp) == 60
        np.testing.assert_allclose(grp.mean(0), c, atol=0.15)


def test_confidence_weighting_shifts_modes(rng):
    # two nearby blobs inside one bandwidth: zero confidence on blob B
    # makes everything collapse onto blob A's center
    pts = _blobs(rng, np.array([[0.0, 0.0], [2.0, 0.0]]), n=50, std=0.1)
    conf = np.concatenate([np.ones(50), np.zeros(50)]).astype(np.float32)
    m = np.asarray(mean_shift(jnp.asarray(pts), jnp.asarray(conf),
                              bandwidth=3.0, iters=30))
    np.testing.assert_allclose(m, np.broadcast_to([0.0, 0.0], m.shape),
                               atol=0.2)


def test_cosine_distance_mode():
    d = np.stack([[1, 0, 0], [0.99, 0.05, 0], [0, 1, 0], [0.03, 0.99, 0]]
                 ).astype(np.float32)
    modes, labels = mean_shift_cluster(jnp.asarray(d), bandwidth=0.2,
                                       iters=15, tol=0.3,
                                       dist_type="cosine")
    labels = np.asarray(labels)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
