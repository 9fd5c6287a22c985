"""Parallel tempering (replica exchange) over a beta ladder.

The "don't stop at parity" sampler (SURVEY.md §7 plans an "SA /
parallel-tempering kernel"): R independent replicas run heat-bath sweeps at
each of M inverse temperatures spanning hot → target; adjacent rungs
exchange configurations with the Metropolis swap rule

    p_swap = min(1, exp((β_i − β_j)(E_i − E_j)))

which preserves the joint distribution, so the coldest rung samples the
*target* Boltzmann distribution with far better mixing than a one-way
anneal on frustrated problems.  Returned reads come from the target rung.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from qbmx.core.qubo import default_beta_range, split_qubo
from qbmx.samplers.gibbs import _heat_bath_sweep


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps", "num_replicas"))
def pt_sample(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_sweeps: int = 64,
    num_replicas: int = 8,
    beta_target: float = 1.0,
) -> jax.Array:
    """One QUBO → (num_reads, n) samples at ``beta_target``.

    Each read is an independent replica *ladder*: ``num_replicas`` rungs on
    a geometric beta grid from the problem's hot default up to
    ``beta_target``; per sweep every rung does one heat-bath pass, then
    even/odd adjacent pairs attempt exchanges (alternating parity so every
    link is exercised).
    """
    n = Q.shape[-1]
    h, J = split_qubo(Q)
    beta_hot, _ = default_beta_range(Q)
    beta_hot = jnp.minimum(beta_hot, beta_target * 0.5)
    M = num_replicas
    t = jnp.arange(M, dtype=jnp.float32) / max(M - 1, 1)
    betas = jnp.exp(
        jnp.log(beta_hot) + t * (jnp.log(jnp.asarray(beta_target)) - jnp.log(beta_hot))
    )  # (M,) hot → target

    key_init, key_run = jax.random.split(key)
    # state: (M, R, n) — rung-major
    s0 = jax.random.bernoulli(key_init, 0.5, (M, num_reads, n)).astype(jnp.float32)

    def energy(s):  # (..., n) -> (...)
        lin = jnp.einsum("...i,i->...", s, h, precision="highest")
        quad = 0.5 * jnp.einsum(
            "...i,ij,...j->...", s, J, s, precision="highest"
        )
        return lin + quad

    def sweep(state, xs):
        k_sweep, parity = xs
        ks = jax.random.split(k_sweep, M + 2)
        # heat-bath pass per rung at its own beta
        state = jax.vmap(
            lambda s_r, beta, k: _heat_bath_sweep(
                s_r, jax.random.uniform(k, (n, num_reads)), beta, h, J
            )
        )(state, betas, ks[:M])

        # replica exchange between adjacent rungs (alternating parity)
        E = energy(state)  # (M, R)
        lower = jnp.arange(M - 1)  # link i: rungs (i, i+1)
        d_beta = betas[lower + 1] - betas[lower]  # (M-1,)
        dE = E[lower] - E[lower + 1]  # hot-rung minus cold-rung energy
        # accept = min(1, exp((β_hot − β_cold)(E_hot − E_cold))) = exp(−dβ·dE)
        p_swap = jnp.minimum(jnp.exp(-d_beta[:, None] * dE), 1.0)
        u = jax.random.uniform(ks[M], (M - 1, num_reads))
        do_swap = (u < p_swap) & ((lower % 2)[:, None] == parity)

        swap_up = jnp.zeros((M, num_reads), dtype=bool)
        swap_up = swap_up.at[:-1].set(do_swap)  # rung i swaps with i+1
        swap_dn = jnp.zeros((M, num_reads), dtype=bool)
        swap_dn = swap_dn.at[1:].set(do_swap)  # rung i+1 swaps with i

        up_neighbor = jnp.roll(state, -1, axis=0)
        dn_neighbor = jnp.roll(state, 1, axis=0)
        state = jnp.where(swap_up[:, :, None], up_neighbor,
                          jnp.where(swap_dn[:, :, None], dn_neighbor, state))
        return state, None

    keys = jax.random.split(key_run, num_sweeps)
    parities = jnp.arange(num_sweeps, dtype=jnp.int32) % 2
    state, _ = jax.lax.scan(sweep, s0, (keys, parities))
    return state[-1]  # target-beta rung


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps", "num_replicas"))
def pt_sample_batch(key, Q, num_reads, num_sweeps=64, num_replicas=8, beta_target=1.0):
    """``key``: single key, or a (B,) key array (one per problem)."""
    B = Q.shape[0]
    keys = key if key.ndim else jax.random.split(key, B)
    return jax.vmap(
        lambda k, q: pt_sample(k, q, num_reads, num_sweeps, num_replicas, beta_target)
    )(keys, Q)
