"""K-means quantization parity vs REAL sklearn (the reference's backend).

The reference dumps features and quantizes with a joblib-persisted sklearn
KMeans (examples/textless_nlp/gslm/speech2unit/clustering/
quantize_with_kmeans.py:107-121 `kmeans_model.predict(feats)`; trained by
cluster_kmeans.py's MiniBatchKMeans). These tests pin our matmul-argmin
predict and the joblib load/save round trip against genuine sklearn objects:
every unit id must match sklearn's predict exactly.
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
joblib = pytest.importorskip("joblib")

import jax.numpy as jnp  # noqa: E402
from sklearn.cluster import KMeans, MiniBatchKMeans  # noqa: E402

from diffnorm_tpu.models.kmeans import (  # noqa: E402
    kmeans_fit,
    kmeans_predict,
    load_centroids,
    save_centroids,
)


def _toy(n=4000, d=24, k=50, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 4
    assign = rng.integers(0, k, size=n)
    feats = centers[assign] + rng.normal(size=(n, d)).astype(np.float32) * 0.3
    return feats.astype(np.float32), k


def test_predict_matches_sklearn_kmeans():
    feats, k = _toy()
    km = KMeans(n_clusters=k, n_init=3, random_state=0).fit(
        feats[:2000].astype(np.float64))
    want = km.predict(feats.astype(np.float64))
    got = np.asarray(kmeans_predict(
        jnp.asarray(feats), jnp.asarray(km.cluster_centers_, jnp.float32)))
    assert (got == want).mean() == 1.0


def test_predict_matches_minibatch_kmeans():
    # the reference's actual trainer class (cluster_kmeans.py get_kmeans_model)
    feats, k = _toy(seed=3)
    km = MiniBatchKMeans(n_clusters=k, batch_size=512, n_init=2,
                         random_state=1).fit(feats.astype(np.float64))
    want = km.predict(feats.astype(np.float64))
    got = np.asarray(kmeans_predict(
        jnp.asarray(feats), jnp.asarray(km.cluster_centers_, jnp.float32)))
    assert (got == want).mean() == 1.0


def test_joblib_round_trip(tmp_path):
    """load_centroids on a genuine joblib KMeans dump; save_centroids output
    loads back into sklearn with identical predictions."""
    feats, k = _toy(n=1000, seed=5)
    km = KMeans(n_clusters=k, n_init=2, random_state=2).fit(
        feats.astype(np.float64))
    p = tmp_path / "km.bin"
    joblib.dump(km, p)
    cents = load_centroids(str(p))
    np.testing.assert_allclose(cents, km.cluster_centers_, rtol=1e-6)

    ours = kmeans_fit(feats, num_clusters=k, iters=10)
    p2 = tmp_path / "ours.bin"
    save_centroids(str(p2), ours)
    km2 = joblib.load(p2)
    want = km2.predict(feats.astype(np.float64))
    got = np.asarray(kmeans_predict(jnp.asarray(feats), jnp.asarray(ours)))
    assert (got == want).mean() == 1.0
