"""k-center-greedy coreset selection on device.

The reference (utils/coreset.py:13-95) runs sklearn pairwise_distances on the
host, recomputing an [n, |new centers|] matrix per greedy step.  Here the
whole selection is one jitted program:

  * the initial min-distance-to-labeled vector is computed by scanning over
    center chunks (never materializing the [n_pool, n_labeled] matrix), with
    the MXU-friendly ||x||^2 + ||c||^2 - 2 x.c expansion;
  * each greedy step is an argmax + a single distance update, carried through
    lax.fori_loop.

Semantics match the reference exactly: labeled points (distance 0) can never
win the argmax; a selected point's distance drops to 0 so it is not
re-selected; ties resolve to the first index.  The reference's re-selection
bug (utils/coreset.py:87-93, `self.already_selected` never populated before
the loop) is fixed by construction here.

A Pallas tiled kernel for the chunked min-distance scan lives in
ops/pallas/pairwise.py and is used when enabled; this module is the
pure-XLA fallback and the semantics oracle.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 1024


def _min_dist_to_centers(
    features: jnp.ndarray, center_mask: jnp.ndarray
) -> jnp.ndarray:
    """min_i over masked centers of ||x - c_i||, without an [n, n] matrix.

    features: [n, d]; center_mask: [n] bool -> [n] float32.
    """
    n, d = features.shape
    sq = jnp.sum(features * features, axis=-1)  # [n]
    pad = (-n) % _CHUNK
    feats_p = jnp.pad(features, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))
    mask_p = jnp.pad(center_mask, (0, pad))
    num_chunks = feats_p.shape[0] // _CHUNK

    def body(carry, idx):
        start = idx * _CHUNK
        c = jax.lax.dynamic_slice(feats_p, (start, 0), (_CHUNK, d))
        csq = jax.lax.dynamic_slice(sq_p, (start,), (_CHUNK,))
        cmask = jax.lax.dynamic_slice(mask_p, (start,), (_CHUNK,))
        d2 = sq[:, None] + csq[None, :] - 2.0 * features @ c.T  # [n, CHUNK]
        d2 = jnp.where(cmask[None, :], jnp.maximum(d2, 0.0), jnp.inf)
        return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

    init = jnp.full((n,), jnp.inf, jnp.float32)
    min_d2, _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    return jnp.sqrt(min_d2)


@partial(jax.jit, static_argnames=("n_select", "use_pallas"))
def k_center_greedy(
    features: jnp.ndarray,
    labeled_mask: jnp.ndarray,
    n_select: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Greedy k-center selection.

    features: [n, d] float32; labeled_mask: [n] bool (initial centers).
    Returns [n_select] int32 indices into `features` — all from the
    unlabeled part, in selection order.  `use_pallas` routes the initial
    min-distance sweep through the tiled MXU kernel
    (ops/pallas/pairwise.py).
    """
    if use_pallas:
        from .pallas import pairwise as pallas_pairwise

        min_dist = pallas_pairwise.min_distance_to_centers(features, labeled_mask)
    else:
        min_dist = _min_dist_to_centers(features, labeled_mask)

    def step(i, carry):
        min_dist, selected = carry
        # Labeled points are hard-excluded from the argmax: the chunked
        # ||x||^2+||c||^2-2x.c expansion can leave them at a tiny positive
        # distance to themselves (cancellation), which would otherwise beat
        # exhausted unlabeled points sitting at exactly 0.
        ind = jnp.argmax(jnp.where(labeled_mask, -1.0, min_dist))
        d = jnp.sqrt(
            jnp.maximum(
                jnp.sum(jnp.square(features - features[ind]), axis=-1), 0.0
            )
        )
        min_dist = jnp.minimum(min_dist, d)
        selected = selected.at[i].set(ind.astype(jnp.int32))
        return min_dist, selected

    selected = jnp.zeros((n_select,), jnp.int32)
    _, selected = jax.lax.fori_loop(0, n_select, step, (min_dist, selected))
    return selected


def center_poses(poses: np.ndarray, root_index: int) -> np.ndarray:
    """Root-center and flatten 3D poses into coreset features.

    poses: [n, K, 3] -> [n, 3K], transposed to the reference's (3, K)
    flattening order (utils/coreset.py:35-47) so distances match.
    """
    arr = np.transpose(np.asarray(poses, dtype=np.float32), (0, 2, 1))  # [n, 3, K]
    arr = arr - arr[:, :, root_index : root_index + 1]
    return arr.reshape(arr.shape[0], -1)


class CoreSet:
    """Reference-compatible wrapper (utils/coreset.py:13-95).

    sal_dict: {guid: pose [K, 3]-like} for the unlabeled pool;
    al_dict: {key: pose} for the already-labeled set.

    `features` overrides the pose feature space with an explicit
    [len(sal_dict) + len(al_dict), d] matrix, rows in sal-then-al order —
    the AL.CORESET_FEATURES=EMBEDDING path (pooled CNN trunk embeddings,
    the coreset paper's formulation).  k-center semantics are identical;
    only the metric space changes.
    """

    def __init__(self, sal_dict, al_dict, joint_root_index: int,
                 features=None):
        self.sal_keys: List = list(sal_dict.keys())
        self.n_sal = len(sal_dict)
        self.n_obs = len(sal_dict) + len(al_dict)
        if features is not None:
            features = np.asarray(features, dtype=np.float32)
            assert features.shape[0] == self.n_obs, (
                features.shape, self.n_obs,
            )
            self.features = features
            return
        sal = [np.asarray(v) for v in sal_dict.values()]
        al = [np.asarray(v) for v in al_dict.values()]
        # The reference stores poses as [K, rows>=3] lists; normalize to
        # [K, 3].
        all_poses = np.stack([p[:, :3] if p.shape[-1] >= 3 else p for p in sal + al])
        self.features = center_poses(all_poses, joint_root_index)

    def select_batch(self, n: int) -> List:
        labeled = np.zeros((self.n_obs,), bool)
        labeled[self.n_sal :] = True
        idx = np.asarray(
            k_center_greedy(
                jnp.asarray(self.features), jnp.asarray(labeled), int(n)
            )
        )
        assert (idx < self.n_sal).all(), "greedy selected a labeled point"
        return [self.sal_keys[i] for i in idx]
