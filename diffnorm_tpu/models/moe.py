"""BASE-layer mixture-of-experts with balanced routing.

Capability parity with fairseq/modules/base_layer.py + the libbase
`balanced_assignment` C++ auction op (SURVEY §2d/§2e "expert parallel"):
each token routes to exactly one expert FFN, with every expert receiving the
same number of tokens (no dropped tokens, no aux balancing loss).

TPU redesign: the assignment itself must live inside jit, so the default
router is a Sinkhorn-normalized balanced assignment (differentiable-free
argsort over normalized scores — the standard jit-friendly relaxation of the
auction); the host-side C ABI `balanced_assignment` (csrc) implements the
reference's exact k-jobs-per-worker auction for offline use and testing
(pinned against the compiled real libbase in tests/test_reference_parity.py).
Experts vmap over a leading expert axis, which shards over the "model" mesh
axis (expert parallelism) via parallel/sharding_rules.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def balanced_assignment_host(scores: np.ndarray) -> np.ndarray:
    """Exact host-side balanced assignment (libbase parity).
    scores: [n_tokens, n_experts]; returns [n_tokens] expert ids."""
    from diffnorm_tpu.data.batching import _load_native

    scores = np.ascontiguousarray(scores, np.float32)
    n, e = scores.shape
    assert n % e == 0, "token count must divide evenly among experts"
    out = np.zeros((n,), np.int64)
    lib = _load_native()
    if lib:
        lib.balanced_assignment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.balanced_assignment(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, e,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        return out
    # numpy fallback: the same auction algorithm as csrc (reference libbase
    # balanced_assignment.cpp — k-jobs-per-worker auction, Bertsekas P-2108)
    k = n // e
    max_iterations = 100
    epsilon = max((scores.max() - scores.min()) / 50.0, 1e-4)
    max_value = float(scores.max())
    wj = np.ascontiguousarray(scores.T, np.float32)  # [e, n]
    value = wj.copy()
    cost = np.zeros(n, np.float32)
    bid_indices = np.zeros(0, np.int64)
    counter = 0
    while True:
        bids = np.zeros((e, n), np.float32)
        # top k+1 per worker, desc with lower-index tie break
        order = np.lexsort((np.arange(n)[None, :].repeat(e, 0), -value),
                           axis=1)[:, : k + 1]
        kth = value[np.arange(e)[:, None], order[:, k:]]
        inc = value[np.arange(e)[:, None], order[:, :k]] - kth + epsilon
        np.put_along_axis(bids, order[:, :k], inc.astype(np.float32), axis=1)
        if 0 < counter < max_iterations:
            bids.reshape(-1)[bid_indices] = epsilon  # retention bids
        high_bidders = bids.argmax(axis=0)  # ties -> lowest worker
        high_bids = bids[high_bidders, np.arange(n)]
        if (high_bids > 0).all():
            break
        cost += high_bids
        value = wj - cost[None, :]
        have = high_bids > 0
        bid_indices = (high_bidders[have] * n
                       + np.arange(n)[have]).astype(np.int64)
        value.reshape(-1)[bid_indices] = (
            max_value if counter < max_iterations
            else wj.reshape(-1)[bid_indices])
        counter += 1
    for w in range(e):
        out[order[w, :k]] = w
    return out


def sinkhorn_routing(scores, iters: int = 8):
    """Jit-friendly balanced routing: Sinkhorn-normalize exp(scores) toward
    doubly-stochastic, then greedily fill experts to equal capacity by
    normalized score rank. scores: [N, E] -> (expert_id [N], sorted token
    order [N] grouping tokens by expert)."""
    n, e = scores.shape
    cap = n // e
    log_p = scores.astype(jnp.float32)

    def body(lp, _):
        lp = lp - jax.nn.logsumexp(lp, axis=1, keepdims=True)  # rows sum 1
        lp = lp - jax.nn.logsumexp(lp, axis=0, keepdims=True)  # cols balanced
        return lp, ()

    log_p, _ = jax.lax.scan(body, log_p, jnp.arange(iters))

    # exact capacity fill: experts claim their top-cap unclaimed tokens in
    # turn (E is small; every expert ends with exactly cap tokens, so the
    # downstream [E, cap] regroup is sound)
    def claim(carry, e_idx):
        taken, expert_id = carry
        col = jnp.where(taken, -jnp.inf, log_p[:, e_idx])
        _, idx = jax.lax.top_k(col, cap)
        taken = taken.at[idx].set(True)
        expert_id = expert_id.at[idx].set(e_idx)
        return (taken, expert_id), ()

    taken0 = jnp.zeros((n,), bool)
    id0 = jnp.zeros((n,), jnp.int32)
    (_, expert_id), _ = jax.lax.scan(claim, (taken0, id0), jnp.arange(e))
    return expert_id


class BaseLayer(nn.Module):
    """One BASE MoE layer: route -> per-expert FFN (vmapped) -> unroute.

    Expert parameters carry a leading [num_experts] axis that the sharding
    rules place on the "model" mesh axis — expert parallelism without any
    bespoke communication code (GSPMD all-to-alls from the gathers).
    """

    dim: int
    ffn_dim: int
    num_experts: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, dim] token-major (flatten [B, T] upstream; N % E == 0)."""
        n = x.shape[0]
        e = self.num_experts
        cap = n // e
        centroids = self.param(
            "expert_centroids", nn.initializers.normal(0.02),
            (e, self.dim), jnp.float32,
        )
        scores = x.astype(jnp.float32) @ centroids.T  # [N, E]
        expert_id = sinkhorn_routing(scores)

        # stable sort tokens by expert -> [E, cap, dim]
        order = jnp.argsort(expert_id, axis=0, stable=True)
        routed = x[order].reshape(e, cap, self.dim)

        w1 = self.param(
            "experts_w1", nn.initializers.lecun_normal(),
            (e, self.dim, self.ffn_dim), jnp.float32,
        ).astype(self.dtype)
        w2 = self.param(
            "experts_w2", nn.initializers.lecun_normal(),
            (e, self.ffn_dim, self.dim), jnp.float32,
        ).astype(self.dtype)
        h = jnp.einsum("ecd,edf->ecf", routed.astype(self.dtype), w1,
                       preferred_element_type=self.dtype)
        h = nn.relu(h)
        h = jnp.einsum("ecf,efd->ecd", h, w2,
                       preferred_element_type=self.dtype)

        # gate by routing affinity (BASE: sigmoid of score to chosen expert)
        flat = h.reshape(n, self.dim)
        unrouted = jnp.zeros_like(flat).at[order].set(flat)
        chosen = jnp.take_along_axis(scores, expert_id[:, None], axis=1)[:, 0]
        gate = nn.sigmoid(chosen).astype(x.dtype)[:, None]
        return x + gate * unrouted.astype(x.dtype)
