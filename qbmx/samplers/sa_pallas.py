"""Pallas TPU kernel for batched simulated annealing.

The on-chip replacement for dwave-neal's C++ Metropolis core (SURVEY.md §2a:
"this is the performance core — sampling is ~80% of wall time").

Design: **interleaved block-diagonal problem packing.**  P QUBOs are packed
into one coupling tile with variables ordered *step-major*: row ``i*P + p``
is variable ``i`` of packed problem ``p``.  One Metropolis step then updates
variable ``i`` of all P problems across all chains with

  * a contiguous-sublane slice of P rows (state, uniforms, schedule), and
  * a single ``(P, N) @ (N, R)`` MXU matmul for the local fields

— the TPU-native analogue of the reference's Pegasus chip-partitioning trick
(embedding ~10 replicated QUBOs per anneal, ``src/embedding.py:193-223``,
``duplicate_and_concatenate_qubo``, ``src/model/faster_dqbm.py:287-297``).
Because each row is touched at exactly one step per sweep, the uniform
variates for a whole sweep are drawn once as an (N, R) block.

Other kernel notes:
  * Variables on sublanes, chains on lanes; state lives in the output ref and
    is updated via ``pl.ds`` sublane slices (Mosaic-friendly).
  * Linear terms fold into the couplings through an always-one auxiliary
    variable per problem (step-``n`` rows, never updated).
  * Per-problem geometric beta schedules (neal-style default range) are
    evaluated in-kernel from per-row (hot, log-ratio) params — a (S, N)
    table would lane-pad 128× in VMEM.
  * On-chip PRNG seeded per grid program; every chain/row draws independent
    uniforms (the reference reused one seed across its 10 SA workers,
    SURVEY.md §2c.4).

CAUTION (axon toolchain): a pallas_call inside lax.scan hangs the AOT
compiler — see CLAUDE.md; callers route around it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbmx.core.qubo import default_beta_range, split_qubo


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_ceil(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length()


# Routing constants, measured on v5e (min-of-2 30-call bursts, 1000 sweeps):
# grid programs run SEQUENTIALLY on the core, so larger packs (bigger P →
# fewer programs) win until the per-substep MXU work (P·N·R flops) makes the
# matmuls throughput-bound.  26M was the measured knee: n=41 B=60 R=128 runs
# 49.3→18.5 ms from P=8→64 (25M) while R=1024 prefers P=16 (12.6M; P=32 at
# 50M regresses 61→80 ms); n=6 B=120 R=1024 prefers P=32 (8.4M; P=64 at 33M
# regresses 7.6→9.9 ms); n=130 B=8 runs 111→21 ms from P=1→8.
#
# The knee holds at large batches too: n=6 B=1200 R=1024 measures
# P=8/16/32/64/128 = 181/90/66/85/137 ms (cache-cleared forced
# geometries, scripts/probe_pack_routing.py) — P=32 (8.4M, under the
# knee) wins and P=64 (33.6M) regresses 29%, matching the B=120
# measurement.  An earlier "relaxed knee for B ≥ 8·P" change was based
# on jit-cache-contaminated timings and is deliberately NOT here.
_MXU_WORK_BUDGET = 26_000_000
_VMEM_BUDGET = 48 * 2**20


def pack_geometry(n: int, batch: int | None = None,
                  reads: int | None = None) -> tuple[int, int, int]:
    """(stride, P, N): per-problem variable slots, problems per pack, padded
    pack size.  P must be 1 or a multiple of 8 (Mosaic sublane alignment);
    it is chosen from the measured routing rules above, capped at the
    batch's next power of two (packing more than the batch pads dead
    problems) and by VMEM."""
    stride = _round_up(n + 1, 8)  # +1 = always-one bias variable
    B = 64 if batch is None else max(int(batch), 1)
    Rr = _round_up(reads if reads else 128, 128)
    if stride <= 16 and Rr <= 128:
        P = 128 // stride  # one row tile; the masked strategy handles it
        return stride, P, _round_up(stride * P, 128)
    P_best, N_best = 1, _round_up(stride, 128)
    for P in (8, 16, 32, 64, 128):
        if P > _pow2_ceil(B):
            break
        N = _round_up(stride * P, 128)
        if P * N * Rr > _MXU_WORK_BUDGET:
            break
        if B > P:
            # multi-pack grids double-buffer their input blocks, and the
            # whole pipelined working set (2×J + in/out/scratch (N,R)
            # blocks) must fit the compiler's 16 MiB scoped-VMEM limit —
            # exceeding it is a compile-time OOM, observed at N=1536
            # (2×9 MiB of J + 0.75 MiB scratch = 18.75 MiB).  A single
            # pack has no pipelining and tolerates the full VMEM budget
            # (N=3072's 37.7 MB J tile compiles and runs at B=60) — so a
            # multi-pack rejection only SKIPS this P: the next tier may
            # hold the whole batch in one pack and pass the looser check.
            if 4 * (2 * N * N + 3 * N * Rr) > 15 * 2**20:
                continue
        elif 4 * (N * N + 2 * N * Rr) > _VMEM_BUDGET:
            break
        P_best, N_best = P, N
    return stride, P_best, N_best


def block_vars(P: int) -> int:
    """Variables fused per block-sweep step (K).  K*P must be 8-aligned for
    Mosaic sublane slicing; K is capped so the statically-unrolled inner
    loop stays small."""
    if P % 8 == 0:
        return max(1, min(16, 128 // P))
    return 16  # P == 1: BS = 16 rows, 8-aligned


def _sa_kernel(seed_ref, hot_ref, logr_ref, J_ref, Jd_ref, *rest, n: int,
               P: int, num_sweeps: int, use_mask: bool, debug: bool = False):
    """One pack of P problems, interleaved layout.

    J_ref (1, N, N): couplings, row i*P+p = var i of problem p;
    Jd_ref (1, nb, BS, BS): per-block diagonal sub-blocks of J (the
    within-block couplings the block-sweep corrections need — Mosaic
    forbids dynamic lane slicing of J itself);
    hot/logr (1, N, 1): per-row schedule params; out (1, N, R) state;
    u_ref (N, R) scratch for per-sweep uniforms.

    Two per-step strategies (chosen statically, measured on v5e):
      * use_mask (small strides AND one lane tile of chains): full
        (N,N)@(N,R) matmul + masked flip — static full-tile ops only.
      * block-sweep (everything else): K = BS/P variables fuse into ONE
        (BS,N)@(N,R) field matmul; the K Metropolis sub-steps then run
        statically unrolled, each correcting the remaining in-block fields
        with a small (BS,P)@(P,R) rank-update from the accepted flips
        (J is symmetric; only the diagonal BS×BS block is ever needed).
        ~K× fewer sequential MXU ops than one matmul per variable
        (VERDICT r1 #6: 2.3× at the n=41 CDQBM shape, see PERFORMANCE.md).

    ``debug=True`` (the CI path, VERDICT r1 #4): the init bits (1, N, R)
    and the per-sweep uniforms (1, S, N, R) arrive as host-supplied inputs
    instead of ``pltpu.prng_random_bits``, so the Metropolis update math
    runs under ``interpret=True`` on CPU and is regression-locked against
    ``sa_jax._metropolis_sweep`` given the same variates.
    """
    if debug:
        init_ref, u_all_ref, out_ref, u_ref = rest
    else:
        out_ref, u_ref = rest
    g = pl.program_id(0)
    N = out_ref.shape[1]
    R = out_ref.shape[2]

    row = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)
    step_of_row = row // P  # which variable-step this row belongs to

    # random {0,1} init for variable rows; 1.0 on bias rows; 0 on padding
    if debug:
        rand01 = init_ref[0]
    else:
        pltpu.prng_seed(seed_ref[0, 0] + g)
        bits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
        rand01 = pltpu.bitcast(bits & 1, jnp.int32).astype(jnp.float32)
    out_ref[0] = jnp.where(step_of_row < n, rand01,
                           jnp.where(step_of_row == n, 1.0, 0.0))

    inv_span = jnp.float32(1.0 / max(num_sweeps - 1, 1))
    inv24 = jnp.float32(1.0 / 16777216.0)

    K = block_vars(P)
    BS = K * P
    nb_full, rem = divmod(n, K)

    if use_mask:
        J = J_ref[0]  # (N, N) cached for the whole anneal
    hot = hot_ref[0]  # (N, 1)
    logr = logr_ref[0]

    def sweep_body(t, carry):
        frac = t.astype(jnp.float32) * inv_span
        # one (N, R) block of uniforms serves the whole sweep: each row is
        # Metropolis-updated at exactly one step (its own variable index).
        # The uniforms are converted to ACCEPTANCE THRESHOLDS up front:
        # u < exp(-beta*max(delta,0))  ⟺  delta < -log(u)/beta  for
        # u ∈ [0,1), beta > 0 — one compare per sub-step instead of
        # exp+max+compare, and no per-sub-step schedule reads.  sa_jax
        # uses the same formulation (CI debug tests lock them bit-for-bit).
        if debug:
            u = u_all_ref[0, t]
        else:
            ubits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
            u = pltpu.bitcast(ubits >> 8, jnp.int32).astype(jnp.float32) * inv24
        beta_rows = hot * jnp.exp(logr * frac)  # (N, 1), once per sweep
        u_ref[...] = -jnp.log(u) / beta_rows

        if use_mask:

            def var_body(i, carry):
                s = out_ref[0]
                field = jnp.dot(J, s, preferred_element_type=jnp.float32)
                delta = (1.0 - 2.0 * s) * field
                accept = delta < u_ref[...]
                flip = jnp.logical_and(accept, step_of_row == i)
                out_ref[0] = jnp.where(flip, 1.0 - s, s)
                return carry

            return jax.lax.fori_loop(0, n, var_body, carry)

        def do_block(b, r0, k_here):
            """One block of ``k_here`` fused variable sub-steps starting at
            row ``r0`` (8-aligned).  b indexes Jd_ref."""
            aligned = pl.multiple_of(r0, 8) if BS % 8 == 0 else r0
            Jb = J_ref[0, pl.ds(aligned, BS), :]  # (BS, N)
            F = jnp.dot(Jb, out_ref[0], preferred_element_type=jnp.float32)
            Jd = Jd_ref[0, b]  # (BS, BS) within-block couplings
            for j in range(k_here):  # static unroll
                rj = r0 + j * P
                rows = pl.ds(pl.multiple_of(rj, 8) if P % 8 == 0 else rj, P)
                s_blk = out_ref[0, rows, :]  # (P, R)
                c = 1.0 - 2.0 * s_blk  # flip direction ±1
                delta = c * F[j * P : (j + 1) * P, :]
                accept = delta < u_ref[rows, :]
                ds = jnp.where(accept, c, 0.0)
                out_ref[0, rows, :] = s_blk + ds
                if j < k_here - 1:
                    # correct remaining in-block fields: F += J[:, cols_j] @ ds
                    F = F + jnp.dot(Jd[:, j * P : (j + 1) * P], ds,
                                    preferred_element_type=jnp.float32)

        def block_body(b, carry):
            do_block(b, b * BS, K)
            return carry

        carry = jax.lax.fori_loop(0, nb_full, block_body, carry)
        if rem:
            do_block(nb_full, nb_full * BS, rem)  # static tail block
        return carry

    jax.lax.fori_loop(0, num_sweeps, sweep_body, 0)


def _interleave_rows(A, G, P, stride, N, R, fill):
    """Problem-major (..., Bp, n, R0) → interleaved packed rows (..., G, N, R)
    where row ``i*P + p`` of pack ``g`` is variable ``i`` of problem
    ``g*P + p``.  Padding (extra vars/rows/reads) is filled with ``fill``."""
    *lead, Bp, n_, R0 = A.shape
    lead_pad = [(0, 0)] * len(lead)
    A = jnp.pad(A, lead_pad + [(0, 0), (0, stride - n_), (0, R - R0)],
                constant_values=fill)
    A = A.reshape(*lead, G, P, stride, R)
    A = jnp.moveaxis(A, -3, -2)  # (..., G, stride, P, R)
    A = A.reshape(*lead, G, stride * P, R)
    return jnp.pad(A, lead_pad + [(0, 0), (0, N - stride * P), (0, 0)],
                   constant_values=fill)


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps", "interpret"))
def sa_sample_batch_pallas(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_sweeps: int,
    interpret: bool = False,
    debug_randoms=None,
) -> jax.Array:
    """Batched SA on TPU via Pallas: ``Q`` (B, n, n) → (B, num_reads, n).

    Semantics match :func:`qbmx.samplers.sa_jax.sa_sample_batch` (validated
    against the exact oracle on hardware); only the execution strategy
    differs.

    ``debug_randoms`` (CI path): a ``(init01, uniforms)`` pair of
    host-supplied variates — ``init01`` (B, num_reads, n) in {0,1} and
    ``uniforms`` (num_sweeps, B, n, num_reads) in [0,1) — replacing the
    on-chip PRNG so the kernel runs under ``interpret=True`` on CPU and its
    trajectories can be checked against ``sa_jax`` exactly.
    """
    B, n = Q.shape[0], Q.shape[-1]
    stride, P, N = pack_geometry(n, batch=B, reads=num_reads)
    R = _round_up(num_reads, 128)
    G = -(-B // P)  # number of packs
    Bp = G * P

    h, J = split_qubo(Q)
    h = jnp.pad(h.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    J = jnp.pad(J.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, 0)))

    # augmented per-problem couplings (n+1 with bias var)
    J_aug = jnp.zeros((Bp, stride, stride), dtype=jnp.float32)
    J_aug = J_aug.at[:, :n, :n].set(J)
    J_aug = J_aug.at[:, :n, n].set(h)
    J_aug = J_aug.at[:, n, :n].set(h)
    # interleave: row i*P+p of pack g = var i of problem g*P+p
    J_aug = J_aug.reshape(G, P, stride, stride)
    eye = jnp.eye(P, dtype=jnp.float32)
    # T[g, i, p, j, q] = J_aug[g, p, i, j] * eye[p, q]
    J_int = jnp.einsum("gpij,pq->gipjq", J_aug, eye, precision="highest")
    J_int = J_int.reshape(G, P * stride, P * stride)
    J_int = jnp.pad(J_int, ((0, 0), (0, N - P * stride), (0, N - P * stride)))

    beta_hot, beta_cold = default_beta_range(Q)  # (B,)
    if num_sweeps == 1:
        beta_hot = beta_cold  # match sa_jax: a single sweep runs cold
    pad_ones = jnp.ones((Bp - B,), dtype=jnp.float32)
    beta_hot = jnp.concatenate([beta_hot.astype(jnp.float32), pad_ones])
    beta_cold = jnp.concatenate([beta_cold.astype(jnp.float32), 2 * pad_ones])
    log_ratio = jnp.log(beta_cold / beta_hot)

    def per_row(v):  # (Bp,) -> (G, N, 1), interleaved: row i*P+p = problem p
        v = jnp.tile(v.reshape(G, 1, P), (1, stride, 1)).reshape(G, P * stride)
        v = jnp.pad(v, ((0, 0), (0, N - P * stride)), constant_values=1.0)
        return v[..., None]

    seed = jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    debug = debug_randoms is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1), shared
        pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, N), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [seed, per_row(beta_hot), per_row(log_ratio), J_int]
    if debug:
        init01, uniforms = debug_randoms
        init = jnp.swapaxes(init01.astype(jnp.float32), 1, 2)  # (B, n, reads)
        init = jnp.pad(init, ((0, Bp - B), (0, 0), (0, 0)))
        init_p = _interleave_rows(init, G, P, stride, N, R, fill=0.0)
        u = jnp.pad(uniforms.astype(jnp.float32),
                    ((0, 0), (0, Bp - B), (0, 0), (0, 0)), constant_values=1.0)
        u_p = jnp.moveaxis(
            _interleave_rows(u, G, P, stride, N, R, fill=1.0), 0, 1
        )  # (G, S, N, R)
        S = u_p.shape[1]
        in_specs += [
            pl.BlockSpec((1, N, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N, R), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [init_p, u_p]

    # Strategy choice (measured on v5e): the masked full-tile update wins on
    # small strides ONLY while the chain block is one lane tile — its
    # (N,N)@(N,R) per-step matmul scales with R, the block-sweep path's
    # is ~flat (mask 8.2ms vs 10.7ms at R=128, but 320ms vs 10.7ms at
    # R=1024; B=120, n=6, 1000 sweeps).
    use_mask = stride <= 16 and R <= 128

    if use_mask:
        # the masked strategy never reads Jd — pass a minimal placeholder
        nb, BS = 1, 8
        Jd = jnp.zeros((G, nb, BS, 128), jnp.float32)
        jd_spec = pl.BlockSpec((1, nb, BS, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        # per-block diagonal sub-blocks of J for the block-sweep corrections
        # (Mosaic can't dynamically lane-slice J in-kernel)
        K = block_vars(P)
        BS = K * P
        nb = -(-n // K)
        assert nb * BS <= N, (n, P, K, BS, nb, N)  # blocks stay inside the tile
        Jd = jnp.stack(
            [J_int[:, b * BS : (b + 1) * BS, b * BS : (b + 1) * BS] for b in range(nb)],
            axis=1,
        )  # (G, nb, BS, BS)
        jd_spec = pl.BlockSpec((1, nb, BS, BS), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs.insert(4, jd_spec)
    operands.insert(4, Jd)

    out = pl.pallas_call(
        partial(_sa_kernel, n=n, P=P, num_sweeps=num_sweeps,
                use_mask=use_mask, debug=debug),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, R), jnp.float32)],
        interpret=interpret,
    )(*operands)

    # (G, N, R): row i*P+p -> (G, stride, P, R) -> problem-major (Bp, stride, R)
    out = out[:, : P * stride, :].reshape(G, stride, P, R)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(Bp, stride, R)
    return jnp.swapaxes(out[:B, :n, :num_reads], 1, 2)
