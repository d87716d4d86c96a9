"""K-means unit quantization as a single matmul-argmin XLA op.

Capability parity with the reference's joblib/sklearn predict path
(examples/textless_nlp/gslm/speech2unit/clustering/quantize_with_kmeans.py:107-121
and cluster_kmeans.py): loads sklearn KMeans checkpoints (joblib) or raw
centroid .npy, predicts units with argmin ||x - c||^2 = argmin(-2 x.c + |c|^2)
— one [T,768]x[768,K] matmul on the MXU — and trains new codebooks with a
jit-compiled mini-batch Lloyd's iteration.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_centroids(path: str) -> np.ndarray:
    """Load [K, D] centroids from joblib (sklearn KMeans) or .npy."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import joblib

    km = joblib.load(path)
    return np.asarray(km.cluster_centers_, dtype=np.float32)


@functools.partial(jax.jit, static_argnames=())
def kmeans_predict(feats, centroids):
    """feats: [T, D] or [B, T, D]; centroids: [K, D] -> int32 unit ids."""
    c_sq = jnp.sum(jnp.square(centroids), axis=-1)  # [K]
    scores = (
        -2.0 * jnp.einsum(
            "...td,kd->...tk", feats, centroids,
            preferred_element_type=jnp.float32,
        )
        + c_sq
    )
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, donate_argnums=(1,))
def _lloyd_step(feats, centroids):
    """One Lloyd's iteration over a [N, D] batch."""
    assign = kmeans_predict(feats, centroids)
    k = centroids.shape[0]
    one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [N, K]
    sums = one_hot.T @ feats
    counts = jnp.sum(one_hot, axis=0)[:, None]
    new = sums / jnp.maximum(counts, 1.0)
    # keep old centroid where a cluster got no points
    return jnp.where(counts > 0, new, centroids)


def kmeans_fit(
    feats: np.ndarray,
    num_clusters: int,
    iters: int = 50,
    batch_size: int = 65536,
    seed: int = 0,
) -> np.ndarray:
    """Mini-batch Lloyd's on device. feats: [N, D] (host). Returns [K, D]."""
    rng = np.random.default_rng(seed)
    init_idx = rng.choice(len(feats), size=num_clusters, replace=False)
    centroids = jnp.asarray(feats[init_idx], dtype=jnp.float32)
    n = len(feats)
    for it in range(iters):
        idx = rng.choice(n, size=min(batch_size, n), replace=False)
        batch = jnp.asarray(feats[idx], dtype=jnp.float32)
        centroids = _lloyd_step(batch, centroids)
    return np.asarray(jax.device_get(centroids))


def save_centroids(path: str, centroids: np.ndarray):
    if path.endswith(".npy"):
        np.save(path, centroids)
    else:
        import joblib
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=centroids.shape[0])
        km.cluster_centers_ = centroids.astype(np.float64)
        km._n_threads = 1
        joblib.dump(km, path)
