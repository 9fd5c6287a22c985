"""Pallas TPU kernel for batched simulated annealing.

The on-chip replacement for dwave-neal's C++ Metropolis core (SURVEY.md §2a:
"this is the performance core — sampling is ~80% of wall time").  One grid
program per QUBO; all ``num_reads`` chains of that problem live in VMEM as a
``(n_pad, reads_pad)`` block and anneal together.  Parallelism is across
chains (and across problems via the grid), never within a sweep — matching
the reference's reads-only parallelism (``src/model/faster_dqbm.py:578-596``)
and preserving single-spin Metropolis statistics.

Kernel design notes:
  * Variables live on the sublane axis, chains on the lane axis, so the
    per-variable sequential update is a sublane-dim dynamic slice (well
    supported by Mosaic) and the local-field computation is a
    ``(1, n_pad) @ (n_pad, R)`` matmul.
  * Linear terms are folded into the couplings via an always-one auxiliary
    variable at row ``n`` (``J_aug[i, n] = h_i``, ``s[n, :] = 1``), so the
    field is a single matvec with no separate bias add.
  * Per-chain randomness comes from the on-chip PRNG seeded per program —
    unlike the reference, which passed one seed to all 10 SA workers
    (``src/model/faster_dqbm.py:580-589``, SURVEY.md §2c.4).
  * The beta schedule is per-problem (computed on host from the problem's
    own coupling scale, like neal's default range) and streamed in as a
    ``(num_sweeps,)`` row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbmx.core.qubo import default_beta_range, geometric_beta_schedule, split_qubo


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sa_kernel(seed_ref, betas_ref, J_ref, out_ref, *, n: int, num_sweeps: int):
    """One problem: J_ref (1, N, N) augmented couplings, out_ref (1, N, R)."""
    b = pl.program_id(0)
    N = J_ref.shape[1]
    R = out_ref.shape[2]
    pltpu.prng_seed(seed_ref[0, 0] + b)

    J = J_ref[0]  # (N, N)

    # --- random {0,1} init for rows < n; row n = 1 (bias var); rest 0.
    bits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
    rand01 = (bits & 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)
    s0 = jnp.where(row < n, rand01, jnp.where(row == n, 1.0, 0.0))

    # uniforms from the top 24 bits (exactly representable in float32)
    inv24 = jnp.float32(1.0 / 16777216.0)

    def sweep_body(t, s):
        beta = betas_ref[0, t]

        def var_body(i, s):
            Jrow = J[pl.ds(i, 1), :]  # (1, N)
            field = jnp.dot(Jrow, s, preferred_element_type=jnp.float32)  # (1, R)
            s_row = s[pl.ds(i, 1), :]  # (1, R)
            delta = (1.0 - 2.0 * s_row) * field
            ubits = pltpu.bitcast(pltpu.prng_random_bits((1, R)), jnp.uint32)
            u = (ubits >> 8).astype(jnp.float32) * inv24
            accept = u < jnp.exp(-beta * jnp.maximum(delta, 0.0))
            new_row = jnp.where(accept, 1.0 - s_row, s_row)
            return jax.lax.dynamic_update_slice(s, new_row, (i, 0))

        return jax.lax.fori_loop(0, n, var_body, s)

    s = jax.lax.fori_loop(0, num_sweeps, sweep_body, s0)
    out_ref[0] = s


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps"))
def sa_sample_batch_pallas(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_sweeps: int,
) -> jax.Array:
    """Batched SA on TPU via Pallas: ``Q`` (B, n, n) → (B, num_reads, n).

    Semantics match :func:`qbmx.samplers.sa_jax.sa_sample_batch` (validated
    against the exact oracle in tests); only the execution strategy differs.
    """
    B, n = Q.shape[0], Q.shape[-1]
    N = _round_up(n + 1, 128)  # +1 for the always-one bias variable
    R = _round_up(num_reads, 128)

    h, J = split_qubo(Q)
    J_aug = jnp.zeros((B, N, N), dtype=jnp.float32)
    J_aug = J_aug.at[:, :n, :n].set(J.astype(jnp.float32))
    J_aug = J_aug.at[:, :n, n].set(h.astype(jnp.float32))
    J_aug = J_aug.at[:, n, :n].set(h.astype(jnp.float32))

    beta_hot, beta_cold = default_beta_range(Q)  # (B,), (B,)
    betas = geometric_beta_schedule(beta_hot, beta_cold, num_sweeps)  # (S, B)
    betas = jnp.swapaxes(betas, 0, 1).astype(jnp.float32)  # (B, S)

    seed = jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    out = pl.pallas_call(
        partial(_sa_kernel, n=n, num_sweeps=num_sweeps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1), shared
            pl.BlockSpec((1, num_sweeps), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, R), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, R), jnp.float32),
    )(seed, betas, J_aug)

    # (B, N, R) -> (B, R, n)
    return jnp.swapaxes(out[:, :n, :num_reads], 1, 2)
