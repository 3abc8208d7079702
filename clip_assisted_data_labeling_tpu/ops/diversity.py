"""Diversity (farthest-point) ordering in CLIP space, fully on-device.

The reference greedily grows a diverse set by sampling 100 random candidates per
step and torch.load-ing their embeddings from disk each time
(_3_label_images.py:134-177 — 500 steps × 100 file loads). With the columnar
store the whole embedding matrix is one memmap read, and the greedy max-min
selection becomes a single jitted fori_loop over matvecs: track, for every image,
the maximum cosine similarity to the already-selected set; each step picks the
global argmin (the true farthest point, not a 100-sample approximation) and
folds its similarities in.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.ops.similarity import normalize_rows


@functools.partial(jax.jit, static_argnames=("n_order",))
def _farthest_point(normed: jnp.ndarray, n_order: int, seed_idx: int) -> jnp.ndarray:
    n = normed.shape[0]

    def body(_i, state):
        maxsim, selected = state
        pick = jnp.argmin(maxsim)
        sims = normed @ normed[pick]
        maxsim = jnp.maximum(maxsim, sims)
        maxsim = maxsim.at[pick].set(jnp.inf)  # never re-pick
        selected = selected.at[_i].set(pick)
        return maxsim, selected

    maxsim = normed @ normed[seed_idx]
    maxsim = maxsim.at[seed_idx].set(jnp.inf)
    selected = jnp.zeros((n_order,), jnp.int32).at[0].set(seed_idx)
    maxsim, selected = jax.lax.fori_loop(1, n_order, body, (maxsim, selected))
    return selected


@functools.partial(jax.jit, static_argnames=("n_order", "candidates"))
def _farthest_point_sampled(normed, n_order: int, seed_idx: int,
                            candidates: int, key) -> jnp.ndarray:
    """Reference-style greedy max-min over RANDOM candidate subsets
    (_3_label_images.py:147-172 samples 100 candidates per step). Less
    diverse than the exact global argmin — and that is the point: the exact
    version provably chases the dataset's extreme outliers (measured:
    benchmarks/bench_al_loop.py, where exact-FP labeling LOSES to natural
    order on test MSE while this variant does not), because the farthest
    point from everything selected is, by construction, the weirdest image
    in the corpus. Sampling tempers the selection toward dense regions."""
    n = normed.shape[0]

    def body(i, state):
        maxsim, selected, k = state
        k, sub = jax.random.split(k)
        cand = jax.random.randint(sub, (candidates,), 0, n)
        pick = cand[jnp.argmin(maxsim[cand])]
        sims = normed @ normed[pick]
        maxsim = jnp.maximum(maxsim, sims).at[pick].set(jnp.inf)
        selected = selected.at[i].set(pick)
        return maxsim, selected, k

    maxsim = normed @ normed[seed_idx]
    maxsim = maxsim.at[seed_idx].set(jnp.inf)
    selected = jnp.zeros((n_order,), jnp.int32).at[0].set(seed_idx)
    maxsim, selected, _ = jax.lax.fori_loop(
        1, n_order, body, (maxsim, selected, key)
    )
    return selected


def farthest_point_order(
    embeddings: np.ndarray, n_order: int = 500, seed_idx: int = 0,
    candidates: int | None = None, seed: int = 0,
) -> np.ndarray:
    """Indices of a maximally CLIP-diverse prefix of the dataset. The remaining
    indices (original order) are appended, matching the reference's contract
    (_3_label_images.py:175).

    ``candidates=None`` (default) runs the exact global farthest-point;
    ``candidates=k`` runs the reference's sampled variant (k random candidates
    per step, _3:147-150) — see _farthest_point_sampled for when to prefer it."""
    n = len(embeddings)
    n_order = min(n_order, n)
    normed = jnp.asarray(normalize_rows(embeddings))
    if candidates is None:
        prefix = np.asarray(_farthest_point(normed, n_order, seed_idx))
    else:
        key = jax.random.PRNGKey(seed)
        prefix = np.asarray(_farthest_point_sampled(
            normed, n_order, seed_idx, min(candidates, n), key))
        # an exhausted candidate draw (every sample already selected) can
        # emit a duplicate index — dedupe preserving order
        _, first = np.unique(prefix, return_index=True)
        prefix = prefix[np.sort(first)]
    rest = np.setdiff1d(np.arange(n), prefix, assume_unique=False)
    # preserve original order for the tail
    return np.concatenate([prefix, rest])
