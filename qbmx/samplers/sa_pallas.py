"""Pallas TPU kernel for batched simulated annealing.

The on-chip replacement for dwave-neal's C++ Metropolis core (SURVEY.md §2a:
"this is the performance core — sampling is ~80% of wall time").

Design: **block-diagonal problem packing.**  Small QUBOs (the dominant case:
the flat Disc_QBM's clamped/unclamped problems are (H)- and (O+H)-variable)
are padded to an 8-aligned stride and packed P-at-a-time into one
(128, 128)-tile block-diagonal coupling matrix.  One Metropolis step then
updates variable ``i`` of ALL P packed problems across ALL chains with a
single MXU matmul ``J_block @ S`` plus a masked flip — the TPU-native
analogue of the reference's Pegasus chip-partitioning trick (embedding ~10
replicated QUBOs per anneal, ``src/embedding.py:193-223``,
``duplicate_and_concatenate_qubo`` at ``src/model/faster_dqbm.py:287-297``).
Sequential steps per batch shrink by P versus a one-problem-per-grid-step
kernel.

Other kernel notes:
  * Variables on sublanes, chains on lanes; state lives in the output ref,
    updated via ``pl.ds`` sublane slices.
  * Linear terms fold into the couplings through an always-one auxiliary
    variable per problem (row ``n`` of its stride block), so the local field
    is pure matmul.
  * Per-problem geometric beta schedules (neal-style default range) enter as
    a per-row (S, N, 1) table — each packed problem anneals on its own
    schedule.
  * On-chip PRNG seeded per grid program; every chain/row draws independent
    uniforms (the reference reused one seed across its 10 SA workers,
    SURVEY.md §2c.4).

Problems with ``n + 1 > MAX_PACK_VARS`` fall back to the pure-JAX sampler,
which wins there by batching the whole problem set into each sequential
step (see qbmx/samplers/api.py routing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbmx.core.qubo import default_beta_range, geometric_beta_schedule, split_qubo

# Above this many (padded) variables, block-diagonal packing degenerates
# (P=1) and the XLA batched sampler is faster.
MAX_PACK_VARS = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_geometry(n: int) -> tuple[int, int, int]:
    """(stride, P, N): per-problem row stride, problems per block, block size."""
    stride = _round_up(n + 1, 8)  # +1 = always-one bias variable
    if stride <= MAX_PACK_VARS:
        N = 128
        P = N // stride
    else:
        N = _round_up(stride, 128)
        P = 1
    return stride, P, N


def _sa_kernel(seed_ref, hot_ref, logr_ref, J_ref, out_ref, *, n: int, stride: int,
               num_sweeps: int):
    """One pack of P problems: J_ref (1, N, N) block-diagonal augmented
    couplings; hot/logr (1, N, 1) per-row schedule params; out (1, N, R).

    The geometric schedule beta_t = hot · exp(log(cold/hot) · t/(S-1)) is
    evaluated in-kernel — a (S, N)-shaped table would lane-pad to 128× its
    size in VMEM."""
    g = pl.program_id(0)
    N = out_ref.shape[1]
    R = out_ref.shape[2]
    pltpu.prng_seed(seed_ref[0, 0] + g)

    row = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)
    row_mod = row % stride  # position of each row inside its problem

    # random {0,1} init for variable rows; 1.0 on bias rows; 0 on padding
    bits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
    rand01 = pltpu.bitcast(bits & 1, jnp.int32).astype(jnp.float32)
    out_ref[0] = jnp.where(row_mod < n, rand01, jnp.where(row_mod == n, 1.0, 0.0))

    J = J_ref[0]  # (N, N) — cached in VMEM for the whole anneal
    hot = hot_ref[0]  # (N, 1)
    logr = logr_ref[0]  # (N, 1)
    inv_span = jnp.float32(1.0 / max(num_sweeps - 1, 1))
    inv24 = jnp.float32(1.0 / 16777216.0)

    def sweep_body(t, carry):
        frac = t.astype(jnp.float32) * inv_span
        beta = hot * jnp.exp(logr * frac)  # (N, 1) per-row inverse temperature

        def var_body(i, carry):
            s = out_ref[0]  # (N, R)
            # fields of ALL rows of ALL packed problems: one MXU matmul
            field = jnp.dot(J, s, preferred_element_type=jnp.float32)  # (N, R)
            delta = (1.0 - 2.0 * s) * field
            ubits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
            u = pltpu.bitcast(ubits >> 8, jnp.int32).astype(jnp.float32) * inv24
            accept = u < jnp.exp(-beta * jnp.maximum(delta, 0.0))
            flip = jnp.logical_and(accept, row_mod == i)
            out_ref[0] = jnp.where(flip, 1.0 - s, s)
            return carry

        return jax.lax.fori_loop(0, n, var_body, carry)

    jax.lax.fori_loop(0, num_sweeps, sweep_body, 0)


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps", "interpret"))
def sa_sample_batch_pallas(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_sweeps: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched SA on TPU via Pallas: ``Q`` (B, n, n) → (B, num_reads, n).

    Semantics match :func:`qbmx.samplers.sa_jax.sa_sample_batch` (validated
    against the exact oracle in tests); only the execution strategy differs.
    """
    B, n = Q.shape[0], Q.shape[-1]
    stride, P, N = pack_geometry(n)
    R = _round_up(num_reads, 128)
    G = -(-B // P)  # number of packs
    Bp = G * P

    h, J = split_qubo(Q)
    h = jnp.pad(h.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    J = jnp.pad(J.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, 0)))

    # augmented per-problem couplings (n+1 with bias var), then block-diag pack
    J_aug = jnp.zeros((Bp, stride, stride), dtype=jnp.float32)
    J_aug = J_aug.at[:, :n, :n].set(J)
    J_aug = J_aug.at[:, :n, n].set(h)
    J_aug = J_aug.at[:, n, :n].set(h)
    # (G, P, stride, stride) -> block diag (G, N, N)
    J_aug = J_aug.reshape(G, P, stride, stride)
    eye = jnp.eye(P, dtype=jnp.float32)[None, :, None, :, None]  # (1,P,1,P,1)
    J_pack = (J_aug[:, :, :, None, :] * eye).reshape(G, P * stride, P * stride)
    J_pack = jnp.pad(J_pack, ((0, 0), (0, N - P * stride), (0, N - P * stride)))

    beta_hot, beta_cold = default_beta_range(Q)  # (B,)
    pad_ones = jnp.ones((Bp - B,), dtype=jnp.float32)
    beta_hot = jnp.concatenate([beta_hot.astype(jnp.float32), pad_ones])
    beta_cold = jnp.concatenate([beta_cold.astype(jnp.float32), 2 * pad_ones])
    log_ratio = jnp.log(beta_cold / beta_hot)

    def per_row(v):  # (Bp,) -> (G, N, 1)
        v = jnp.repeat(v.reshape(G, P), stride, axis=1)  # (G, P*stride)
        v = jnp.pad(v, ((0, 0), (0, N - P * stride)), constant_values=1.0)
        return v[..., None]

    seed = jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    out = pl.pallas_call(
        partial(_sa_kernel, n=n, stride=stride, num_sweeps=num_sweeps),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1), shared
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, R), jnp.float32),
        interpret=interpret,
    )(seed, per_row(beta_hot), per_row(log_ratio), J_pack)

    # (G, N, R) -> (Bp, stride, R) -> (B, R, n)
    out = out[:, : P * stride, :].reshape(G, P, stride, R).reshape(Bp, stride, R)
    return jnp.swapaxes(out[:B, :n, :num_reads], 1, 2)
