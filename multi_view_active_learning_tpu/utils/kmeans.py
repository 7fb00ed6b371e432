"""Minimal KMeans in JAX (Lloyd's algorithm with k-means++ seeding).

Replaces the reference's sklearn.cluster.KMeans used for SAL pose clustering
(reference: strategy.py:38-52, 973-991).  The SAL pipeline only needs stable
cluster assignments for quota-balanced pseudo-label picking, not sklearn
bit-parity; seeding is deterministic in RANDOM_SEED like the reference's
`random_state`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sq(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[n, d] x [k, d] -> squared distances [n, k] (MXU matmul expansion)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.sum(c * c, axis=-1)
    return jnp.maximum(xx + cc[None, :] - 2.0 * x @ c.T, 0.0)


@partial(jax.jit, static_argnames=("k", "n_iters"))
def _fit(x: jnp.ndarray, init_centers: jnp.ndarray, k: int, n_iters: int):
    def step(centers, _):
        d2 = _pairwise_sq(x, centers)  # [n, k]
        assign = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [n, k]
        counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)  # [k]
        new_centers = (onehot.T @ x) / counts[:, None]
        # Keep empty clusters where they were.
        empty = (jnp.sum(onehot, axis=0) == 0)[:, None]
        return jnp.where(empty, centers, new_centers), None

    centers, _ = jax.lax.scan(step, init_centers, None, length=n_iters)
    return centers


class KMeans:
    """fit/predict API shaped like sklearn's (the subset the SAL loop uses)."""

    def __init__(self, n_clusters: int, random_state: int = 0, n_iters: int = 50):
        self.n_clusters = n_clusters
        self.random_state = int(random_state) & 0x7FFFFFFF
        self.n_iters = n_iters
        self.cluster_centers_ = None

    def fit(self, features) -> "KMeans":
        xs = np.asarray(features, dtype=np.float32)
        rng = np.random.default_rng(self.random_state)
        # k-means++ seeding on host (runs once over a small pool) with a
        # running min-distance-to-centers vector: O(n*d) per new center,
        # and no device round-trip before the data is actually needed on
        # device for Lloyd iterations.
        centers = [xs[rng.integers(len(xs))]]
        d2 = ((xs - centers[0]) ** 2).sum(-1)
        for _ in range(1, self.n_clusters):
            total = float(d2.sum())
            if not np.isfinite(total) or total <= 1e-12:
                # Degenerate pool (every point coincides with a chosen
                # center — duplicate poses, or fewer distinct poses than
                # clusters): the D^2 distribution has no mass, so fall
                # back to uniform choice like sklearn instead of crashing
                # in rng.choice with all-zero probabilities.
                idx = int(rng.integers(len(xs)))
            else:
                idx = int(rng.choice(len(xs), p=d2 / total))
            centers.append(xs[idx])
            d2 = np.minimum(d2, ((xs - xs[idx]) ** 2).sum(-1))
        init = jnp.asarray(np.stack(centers))
        self.cluster_centers_ = _fit(
            jnp.asarray(xs), init, self.n_clusters, self.n_iters
        )
        return self

    def predict(self, features) -> np.ndarray:
        x = jnp.asarray(np.asarray(features, dtype=np.float32))
        if x.ndim == 1:
            x = x[None]
        d2 = _pairwise_sq(x, self.cluster_centers_)
        return np.asarray(jnp.argmin(d2, axis=-1))
