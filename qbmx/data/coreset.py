"""Coreset selection: k-center-greedy subsampling, TPU-native.

Capability parity with the reference ``src/coreset.py`` (torch-based
``k_center_greedy``, ``:28-106``; ``downsample_kcenter_with_light_model``,
``:109-121``; ``random_downsampling``, ``:123-140``) — rebuilt as a jitted
``lax.fori_loop`` over the budget with an O(N) running min-distance vector
instead of the reference's O(budget × N) distance matrix rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("budget",))
def _k_center_greedy_jax(emb: jax.Array, budget: int, first: jax.Array) -> jax.Array:
    """Greedy max-min selection: returns ``budget`` indices into ``emb``."""
    n = emb.shape[0]
    sq = jnp.sum(emb * emb, axis=1)

    def dist_to(idx):
        c = emb[idx]
        d2 = sq + jnp.dot(c, c) - 2.0 * (emb @ c)
        return jnp.sqrt(jnp.clip(d2, 1e-12))

    mins0 = dist_to(first).at[first].set(-jnp.inf)
    selected0 = jnp.zeros((budget,), dtype=jnp.int32).at[0].set(first.astype(jnp.int32))

    def body(i, carry):
        mins, selected = carry
        p = jnp.argmax(mins)
        selected = selected.at[i].set(p.astype(jnp.int32))
        mins = jnp.minimum(mins, dist_to(p)).at[p].set(-jnp.inf)
        return mins, selected

    _, selected = jax.lax.fori_loop(1, budget, body, (mins0, selected0))
    return selected


def k_center_greedy(embedding_matrix, budget: int, random_seed=None, index=None,
                    already_selected=None):
    """Greedy k-center selection over row embeddings.

    Matches the reference's semantics: a random seed center is drawn first
    (counted on top of ``budget``, which the reference increments internally,
    ``src/coreset.py:41``), then max-min greedy picks.  Returns selected
    indices (mapped through ``index`` if given).
    """
    emb = jnp.asarray(np.asarray(embedding_matrix), dtype=jnp.float32)
    n = emb.shape[0]
    budget = min(budget + 1, n)
    if index is not None:
        index = np.asarray(index)
        assert len(index) == n
    else:
        index = np.arange(n)
    rng = np.random.default_rng(random_seed)
    if already_selected:
        first = int(already_selected[0])
    else:
        first = int(rng.integers(0, n))
    sel = np.asarray(_k_center_greedy_jax(emb, budget, jnp.asarray(first)))
    return index[np.unique(sel)]


def downsample_kcenter_with_light_model(qbm, train_x, train_y, budget: int, random_seed: int):
    """Select a coreset in the model's last-hidden embedding space
    (reference ``src/coreset.py:109-121``)."""
    emb = qbm.get_last_hidden_embedding(train_x)
    idx = k_center_greedy(emb, budget=budget, random_seed=random_seed)
    return np.asarray(train_x)[idx], np.asarray(train_y)[idx]


def random_downsampling(x, y, downsample_size: int, seed: int = 42):
    if len(x) < downsample_size:
        raise ValueError(
            "Downsample size must be less than the number of samples in the dataset."
        )
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), downsample_size, replace=False)
    return np.asarray(x)[idx], np.asarray(y)[idx]
