"""Dense QUBO representation and energy math.

Convention (matches the reference's dense upper-triangular matrices, e.g.
``create_qubo_matrix_from`` in ``src/model/faster_dqbm.py:225-284`` and
``src/qubo/builder.py:21-110``): a QUBO is a dense ``(n, n)`` float32 array
``Q`` whose diagonal holds the linear terms and whose strictly-upper triangle
holds the pairwise terms.  The energy of a binary configuration
``s ∈ {0,1}^n`` is

    E(s) = Σ_i Q_ii s_i + Σ_{i<j} (Q_ij + Q_ji) s_i s_j

(the lower triangle is normally zero but is folded in for robustness, the
same way ``dimod.BQM`` sums both triangles).

Everything here is pure jax and shape-static, so it vmaps/jits/shards freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_qubo(Q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a dense QUBO into ``(h, J)``.

    ``h``: (n,) linear terms (the diagonal).
    ``J``: (n, n) symmetric coupling matrix with zero diagonal such that
    ``E(s) = h·s + ½ sᵀ J s``.  The single-flip energy delta for variable
    ``i`` is then ``ΔE_i = (1 - 2 s_i) (h_i + J_i · s)``.
    """
    h = jnp.diagonal(Q, axis1=-2, axis2=-1)
    off = Q - jnp.diagflat(h) if Q.ndim == 2 else Q - _batched_diag(h)
    J = off + jnp.swapaxes(off, -1, -2)
    return h, J


def _batched_diag(h: jax.Array) -> jax.Array:
    return jax.vmap(jnp.diagflat)(h.reshape((-1, h.shape[-1]))).reshape(
        h.shape[:-1] + (h.shape[-1], h.shape[-1])
    )


def qubo_energy(Q: jax.Array, s: jax.Array) -> jax.Array:
    """Energy of a single configuration ``s`` (n,) under QUBO ``Q`` (n, n).

    Oracle-grade math: full float32 (``precision='highest'``), since the
    default matmul precision truncates to bfloat16 inputs on some backends.
    """
    h, J = split_qubo(Q)
    return jnp.dot(h, s, precision="highest") + 0.5 * jnp.dot(
        s, jnp.dot(J, s, precision="highest"), precision="highest"
    )


def qubo_energies(Q: jax.Array, S: jax.Array) -> jax.Array:
    """Energies of a batch of configurations ``S`` (m, n) under ``Q`` (n, n)."""
    h, J = split_qubo(Q)
    lin = jnp.dot(S, h, precision="highest")
    quad = 0.5 * jnp.einsum("mi,ij,mj->m", S, J, S, precision="highest")
    return lin + quad


def default_beta_range(
    Q: jax.Array, fallback: tuple[float, float] = (0.1, 10.0)
) -> tuple[jax.Array, jax.Array]:
    """Heuristic (hot, cold) inverse-temperature range for annealing.

    Statistically equivalent to dwave-neal's default: the hot temperature
    gives even the stiffest variable a ~50% flip chance
    (``β_hot = ln 2 / max_i ΔE_i^max``) and the cold temperature pins the
    softest variable (``β_cold = ln 100 / min_i ΔE_i^max``), where
    ``ΔE_i^max = |h_i| + Σ_j |J_ij|`` bounds the flip energy of variable i.
    Bitwise parity with neal's C++ RNG is not a goal (SURVEY.md §7);
    matched sample statistics are.
    """
    h, J = split_qubo(Q)
    per_var = jnp.abs(h) + jnp.sum(jnp.abs(J), axis=-1)  # (..., n)
    max_delta = jnp.max(per_var, axis=-1)
    # Cold end: freeze out even the smallest individual energy scale
    # (minimum nonzero |h_i| / |J_ij|), like neal's default range.
    mags = jnp.concatenate([jnp.abs(h), jnp.abs(J).reshape(J.shape[:-2] + (-1,))], axis=-1)
    big = jnp.where(mags > 0, mags, jnp.inf)
    min_delta = jnp.min(big, axis=-1)
    hot = jnp.where(max_delta > 0, jnp.log(2.0) / jnp.maximum(max_delta, 1e-12), fallback[0])
    cold = jnp.where(
        jnp.isfinite(min_delta), jnp.log(100.0) / jnp.maximum(min_delta, 1e-12), fallback[1]
    )
    cold = jnp.maximum(cold, hot * 1.0001)  # keep schedule monotone
    return hot, cold


def geometric_beta_schedule(
    beta_hot: jax.Array, beta_cold: jax.Array, num_sweeps: int
) -> jax.Array:
    """Geometric interpolation from hot to cold over ``num_sweeps`` sweeps."""
    if num_sweeps == 1:
        return jnp.asarray([beta_cold], dtype=jnp.float32).reshape((1,) + jnp.shape(beta_cold))
    t = jnp.arange(num_sweeps, dtype=jnp.float32) / (num_sweeps - 1)
    log_hot = jnp.log(beta_hot)
    log_cold = jnp.log(beta_cold)
    shape = (num_sweeps,) + (1,) * jnp.ndim(beta_hot)
    t = t.reshape(shape)
    return jnp.exp(log_hot + t * (log_cold - log_hot)).astype(jnp.float32)


def random_qubo_batch(rng, batch: int, n: int, scale: float = 1.0):
    """(batch, n, n) float32 batch of random upper-triangular QUBOs with
    U(-scale, scale) entries — the probe/validation problem ensemble shared
    by the benchmark scripts (one definition so they all measure the same
    distribution)."""
    import numpy as np

    return jnp.asarray(
        np.stack([np.triu(rng.uniform(-scale, scale, (n, n))) for _ in range(batch)]),
        dtype=jnp.float32,
    )
