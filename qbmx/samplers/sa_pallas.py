"""Pallas TPU kernel for batched annealed sampling (SA / BMS / PT).

The on-chip replacement for the reference's sampling cores: dwave-neal's
C++ Metropolis SA (SURVEY.md §2a: "this is the performance core — sampling
is ~80% of wall time"), the local ``BoltzmannSampler`` "BMS" heat-bath
solver (``src/model/faster_dqbm.py:622-653``), and — beyond the reference —
parallel tempering.  One kernel serves all three: the Metropolis and
heat-bath update rules share the packed block-sweep machinery (only the
acceptance comparison differs), and PT adds fixed per-rung temperatures
plus an in-kernel replica-exchange step.

Design: **interleaved block-diagonal problem packing.**  P QUBOs are packed
into one coupling tile with variables ordered *step-major*: row ``i*P + p``
is variable ``i`` of packed problem ``p``.  One update step then touches
variable ``i`` of all P problems across all chains with

  * a contiguous-sublane slice of P rows (state, thresholds, schedule), and
  * a single ``(P, N) @ (N, R)`` MXU matmul for the local fields

— the TPU-native analogue of the reference's Pegasus chip-partitioning trick
(embedding ~10 replicated QUBOs per anneal, ``src/embedding.py:193-223``,
``duplicate_and_concatenate_qubo``, ``src/model/faster_dqbm.py:287-297``).
Because each row is touched at exactly one step per sweep, the uniform
variates for a whole sweep are drawn once as an (N, R) block.

Update rules (chosen statically):
  * ``"metropolis"`` — neal semantics: flip var i iff
    ``u < exp(-beta*max(delta,0))`` ⟺ ``delta < -log(u)/beta``.
  * ``"heatbath"`` — BMS semantics (``src/model/faster_dqbm.py:622-653``):
    resample var i from its conditional ``p(s_i=1|rest) = σ(-beta*field)``
    ⟺ ``s_i = (field < (log(1-u)-log(u))/beta)``.  Same packed machinery,
    one compare per sub-step; ``qbmx.samplers.gibbs`` uses the identical
    threshold form so the CI debug tests lock them bit-for-bit.

Parallel tempering (``M = num_replicas > 0``): each problem's M rungs are
packed as M consecutive pack slots at fixed per-slot betas; per-slot
energies are tracked incrementally in a (P, R) VMEM scratch (each accepted
update adds ``ds·field``), and after every sweep adjacent rungs
(alternating parity) exchange *states* with the Metropolis swap rule
``dβ·dE < -log(u)`` — sublane rolls move both states and energies.

Other kernel notes:
  * Variables on sublanes, chains on lanes; state lives in the output ref and
    is updated via ``pl.ds`` sublane slices (Mosaic-friendly).
  * Linear terms fold into the couplings through an always-one auxiliary
    variable per problem (step-``n`` rows, never updated).
  * Per-problem geometric beta schedules (neal-style default range) are
    evaluated in-kernel from per-row (hot, log-ratio) params — a (S, N)
    table would lane-pad 128× in VMEM.  PT reuses the two per-row slots as
    (fixed beta, link dβ) instead.
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
from qbmx.samplers.gibbs import _QUAD_PAIRS


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
                  reads: int | None = None,
                  min_p: int = 1) -> tuple[int, int, int]:
    """(stride, P, N): per-problem variable slots, problems per pack, padded
    pack size.  P must be 1 or a multiple of 8 (Mosaic sublane alignment);
    it is chosen from the measured routing rules above, capped at the
    batch's next power of two (packing more than the batch pads dead
    problems) and by VMEM.  ``min_p`` lifts the batch cap up to that floor —
    PT passes its ladder size so whole ladders fit one pack even for tiny
    batches (padding dead slots is the price of rung packing there)."""
    stride = _round_up(n + 1, 8)  # +1 = always-one bias variable
    B = 64 if batch is None else max(int(batch), 1)
    Rr = _round_up(reads if reads else 128, 128)
    if stride <= 16 and Rr <= 128:
        P = 128 // stride  # one row tile; the masked strategy handles it
        return stride, P, _round_up(stride * P, 128)
    P_best, N_best = 1, _round_up(stride, 128)
    cap = _pow2_ceil(B) if min_p <= 1 else max(_pow2_ceil(B), min_p, 8)
    for P in (8, 16, 32, 64, 128):
        if P > cap:
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


def _pack_seed_table(key, G: int, P: int, B: int):
    """(G, 1) int32 on-chip PRNG seed table: row g is a pure function of
    pack g's problems' keys alone (problems ``[g*P, (g+1)*P)``; splitmix32
    finalizer for avalanche between adjacent packs).

    Pack-level stream ISOLATION only: one ``prng_random_bits((N, R))``
    draw covers a whole pack, so per-PROBLEM streams remain unavailable
    here — the XLA and native samplers honor key arrays exactly, the lane
    kernel is per-group (``sa_lane._lane_seed_table``).  A (KB,) key
    array with KB < B (the PT path: keys per ladder, batch expanded to
    ladders × rungs) is repeated ``B // KB`` times, so a pack's seed is a
    function of its own ladders' keys."""
    if key.ndim:
        kd = jax.random.key_data(key.reshape(-1)).astype(jnp.uint32)
        kd = kd.reshape(kd.shape[0], -1)  # (KB, words)
        if kd.shape[0] != B:
            assert B % kd.shape[0] == 0, (kd.shape[0], B)
            kd = jnp.repeat(kd, B // kd.shape[0], axis=0)
        kd = jnp.pad(kd, ((0, G * P - B), (0, 0)))
        kd = kd.reshape(G, -1)  # (G, P·words)
        pos = jnp.arange(kd.shape[1], dtype=jnp.uint32) * jnp.uint32(2654435761)
        base = jnp.bitwise_xor(kd, pos[None]).sum(axis=1)  # (G,)
    else:
        base = jax.random.randint(
            key, (G,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
    x = (base ^ (base >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x % jnp.uint32(2**31 - 1)).astype(jnp.int32).reshape(G, 1)


def _roll_rows(x, shift: int):
    """Circular sublane shift: ``out[r] = x[r - shift]`` (jnp.roll
    semantics on axis 0).  jnp.roll lowers to static slice+concat which
    Mosaic handles; hardware equivalence with the interpreter is pinned by
    the roll check in the TPU test tier (tests/test_tpu_hardware.py)."""
    return jnp.roll(x, shift, axis=0)


# quad state index s = b1·8 + b2·4 + b3·2 + b4 (MSB = lowest variable);
# intra-quad coupling pairs in lexicographic order — _QUAD_PAIRS is imported
# from the XLA oracle (qbmx.samplers.gibbs) so the enumeration CANNOT drift
# between the two implementations (the CI debug tests additionally lock the
# sampled states bit-for-bit).


def _sa_kernel(seed_ref, hot_ref, logr_ref, J_ref, Jd_ref, *rest, n: int,
               P: int, num_sweeps: int, use_mask: bool,
               rule: str = "metropolis", M: int = 0, stride: int = 0,
               pair: bool = False, quad: bool = False, debug: bool = False):
    """One pack of P problems, interleaved layout.

    J_ref (1, N, N): couplings, row i*P+p = var i of problem p;
    Jd_ref (1, nb, BS, BS): per-block diagonal sub-blocks of J (the
    within-block couplings the block-sweep corrections need — Mosaic
    forbids dynamic lane slicing of J itself);
    hot/logr (1, N, 1): per-row schedule params; out (1, N, R) state;
    u_ref (N, R) scratch for per-sweep acceptance thresholds.

    ``rule`` picks the update: Metropolis threshold on the flip delta, or
    heat-bath threshold on the local field (see module docstring).

    ``M > 0`` enables parallel tempering: the P pack slots are P/M ladders
    of M rungs; hot_ref carries the fixed per-slot beta and logr_ref the
    per-slot link spacing dβ = β[slot+1]-β[slot]; E_ref (P, R) scratch
    tracks per-slot energies incrementally and a post-sweep exchange step
    swaps states/energies of accepted adjacent rungs (alternating parity).

    Two per-step strategies (chosen statically, measured on v5e):
      * use_mask (small strides AND one lane tile of chains): full
        (N,N)@(N,R) matmul + masked flip — static full-tile ops only.
      * block-sweep (everything else): K = BS/P variables fuse into ONE
        (BS,N)@(N,R) field matmul; the K update sub-steps then run
        statically unrolled, each correcting the remaining in-block fields
        with a small (BS,P)@(P,R) rank-update from the accepted flips
        (J is symmetric; only the diagonal BS×BS block is ever needed).
        ~K× fewer sequential MXU ops than one matmul per variable
        (VERDICT r1 #6: 2.3× at the n=41 CDQBM shape, see PERFORMANCE.md).

    ``debug=True`` (the CI path, VERDICT r1 #4): the init bits (1, N, R)
    and the per-sweep uniforms (1, S, N, R) — plus, for PT, the per-sweep
    swap uniforms (1, S, P, R) — arrive as host-supplied inputs instead of
    ``pltpu.prng_random_bits``, so the update math runs under
    ``interpret=True`` on CPU and is regression-locked against
    ``sa_jax._metropolis_sweep`` / ``gibbs._heat_bath_sweep`` given the
    same variates.
    """
    pt = M > 0
    assert not (pt and use_mask), "PT requires the block-sweep strategy"
    assert not ((pair or quad) and (pt or use_mask or rule != "heatbath")), (
        "joint updates: heat-bath block-sweep only"
    )
    assert not (pair and quad), "pair and quad updates are exclusive"
    joint = pair or quad
    if debug:
        if pt:
            init_ref, u_all_ref, swap_all_ref, out_ref, u_ref, E_ref = rest
        elif joint:
            init_ref, u_all_ref, out_ref, u_ref, beta_ref = rest
        else:
            init_ref, u_all_ref, out_ref, u_ref = rest
    else:
        if pt:
            out_ref, u_ref, E_ref = rest
        elif joint:
            out_ref, u_ref, beta_ref = rest
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
        pltpu.prng_seed(seed_ref[g, 0])  # per-pack stream table
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

    if pt:
        # initial per-slot energies: E = ½ sᵀ J s summed over each slot's
        # rows (J_int carries h on the bias row/col, so this is the full
        # QUBO energy of the slot's configuration)
        s0 = out_ref[0]
        f0 = jnp.dot(J_ref[0], s0, preferred_element_type=jnp.float32)
        contrib = 0.5 * s0 * f0  # (N, R)
        E0 = contrib[0:P, :]
        for i in range(1, stride):  # static unroll over variable steps
            E0 = E0 + contrib[i * P:(i + 1) * P, :]
        E_ref[...] = E0

    def sweep_body(t, carry):
        frac = t.astype(jnp.float32) * inv_span
        # one (N, R) block of uniforms serves the whole sweep: each row is
        # updated at exactly one step (its own variable index).  The
        # uniforms are converted to ACCEPTANCE THRESHOLDS up front —
        # Metropolis: u < exp(-beta*max(delta,0))  ⟺  delta < -log(u)/beta;
        # heat-bath: u < σ(-beta*field)  ⟺  field < (log(1-u)-log(u))/beta
        # for u ∈ [0,1), beta > 0 — one compare per sub-step instead of
        # exp/sigmoid+compare, and no per-sub-step schedule reads.  sa_jax
        # and gibbs use the same formulations (CI debug tests lock them
        # bit-for-bit).
        if debug:
            u = u_all_ref[0, t]
        else:
            ubits = pltpu.bitcast(pltpu.prng_random_bits((N, R)), jnp.uint32)
            u = pltpu.bitcast(ubits >> 8, jnp.int32).astype(jnp.float32) * inv24
        if pt:
            beta_rows = hot  # fixed per-rung temperatures, no annealing
        else:
            beta_rows = hot * jnp.exp(logr * frac)  # (N, 1), once per sweep
        if joint:
            # joint sub-steps need the 4-/16-state categorical, so keep the
            # raw uniforms and stash beta per row (lane-padded — a (N,1)
            # VMEM scratch would pad to 128 lanes anyway, CLAUDE.md)
            u_ref[...] = u
            beta_ref[...] = jnp.broadcast_to(beta_rows, (N, 128))
        elif rule == "metropolis":
            u_ref[...] = -jnp.log(u) / beta_rows
        else:
            u_ref[...] = (jnp.log(1.0 - u) - jnp.log(u)) / beta_rows

        if use_mask:

            def var_body(i, carry):
                s = out_ref[0]
                field = jnp.dot(J, s, preferred_element_type=jnp.float32)
                if rule == "metropolis":
                    delta = (1.0 - 2.0 * s) * field
                    accept = delta < u_ref[...]
                    flip = jnp.logical_and(accept, step_of_row == i)
                    out_ref[0] = jnp.where(flip, 1.0 - s, s)
                else:
                    new = (field < u_ref[...]).astype(jnp.float32)
                    out_ref[0] = jnp.where(step_of_row == i, new, s)
                return carry

            return jax.lax.fori_loop(0, n, var_body, carry)

        def do_block(b, r0, k_here):
            """One block of ``k_here`` fused variable sub-steps starting at
            row ``r0`` (8-aligned).  b indexes Jd_ref."""
            aligned = pl.multiple_of(r0, 8) if BS % 8 == 0 else r0
            Jb = J_ref[0, pl.ds(aligned, BS), :]  # (BS, N)
            F = jnp.dot(Jb, out_ref[0], preferred_element_type=jnp.float32)
            Jd = Jd_ref[0, b]  # (BS, BS) within-block couplings

            if joint:
                # joint Gibbs: variable QUADS (when ``quad``) then PAIRS
                # then a trailing single are resampled from their exact
                # 16-/4-state joint conditionals — 1/4 (resp. 1/2) the
                # sequential sub-steps per sweep (the kernel's measured
                # floor is the per-sub-step chain, PERFORMANCE.md §1).
                # Semantics = gibbs._quad_heat_bath_sweep /
                # _pair_heat_bath_sweep (CI-locked bit-for-bit).
                eyeP = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
                        == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
                        ).astype(jnp.float32)

                def prows(off):
                    rj = r0 + off
                    return pl.ds(pl.multiple_of(rj, 8) if P % 8 == 0 else rj, P)

                def cdiag(off_a, off_b):
                    # per-problem coupling J[var_a, var_b]: diagonal of the
                    # (P, P) cross block (Mosaic-friendly: multiply by eye,
                    # sum) — (P, 1)
                    return jnp.sum(
                        Jd[off_a : off_a + P, off_b : off_b + P] * eyeP,
                        axis=1, keepdims=True)

                nquads = k_here // 4 if quad else 0
                done = 4 * nquads
                npairs, tail = divmod(k_here - done, 2)

                for qd in range(nquads):  # static unroll
                    j1 = 4 * qd * P
                    offs = [j1 + a * P for a in range(4)]
                    rows = [prows(o) for o in offs]
                    s_old = [out_ref[0, r, :] for r in rows]
                    f = [F[o : o + P, :] for o in offs]
                    c = {ab: cdiag(offs[ab[0]], offs[ab[1]])
                         for ab in _QUAD_PAIRS}
                    fp = []
                    for a in range(4):
                        fa = f[a]
                        for b in range(4):
                            if b != a:
                                fa = fa - c[(min(a, b), max(a, b))] * s_old[b]
                        fp.append(fa)
                    beta = beta_ref[rows[0], :][:, 0:1]  # (P, 1)
                    es = [jnp.zeros_like(fp[0])]
                    for idx in range(1, 16):
                        bits = [(idx >> (3 - a)) & 1 for a in range(4)]
                        acc = None
                        for a in range(4):
                            if bits[a]:
                                acc = fp[a] if acc is None else acc + fp[a]
                        for a, b in _QUAD_PAIRS:
                            if bits[a] and bits[b]:
                                acc = acc + c[(a, b)]
                        es.append(-beta * acc)
                    m = es[1]
                    for idx in range(2, 16):
                        m = jnp.maximum(m, es[idx])
                    m = jnp.maximum(m, 0.0)
                    ws = [jnp.exp(e - m) for e in es]
                    cum = ws[0]
                    cums = [cum]
                    for idx in range(1, 16):
                        cum = cum + ws[idx]
                        cums.append(cum)
                    t4 = u_ref[rows[0], :] * cums[15]
                    sel = jnp.zeros_like(t4, dtype=jnp.int32)
                    for idx in range(15):
                        sel = sel + (t4 >= cums[idx]).astype(jnp.int32)
                    new = [jnp.bitwise_and(jnp.right_shift(sel, 3 - a), 1
                                           ).astype(jnp.float32)
                           for a in range(4)]
                    for a in range(4):
                        out_ref[0, rows[a], :] = new[a]
                    if 4 * (qd + 1) < k_here:
                        ds4 = jnp.concatenate(
                            [new[a] - s_old[a] for a in range(4)], axis=0)
                        F = F + jnp.dot(Jd[:, j1 : j1 + 4 * P], ds4,
                                        preferred_element_type=jnp.float32)

                for q in range(npairs):  # static unroll
                    j1 = (done + 2 * q) * P
                    rows1, rows2 = prows(j1), prows(j1 + P)
                    s1 = out_ref[0, rows1, :]
                    s2 = out_ref[0, rows2, :]
                    f1 = F[j1 : j1 + P, :]
                    f2 = F[j1 + P : j1 + 2 * P, :]
                    c = cdiag(j1, j1 + P)  # (P, 1) per-problem pair coupling
                    beta = beta_ref[rows1, :][:, 0:1]  # (P, 1)
                    f1p = f1 - c * s2  # fields excluding the partner
                    f2p = f2 - c * s1
                    e01 = -beta * f2p
                    e10 = -beta * f1p
                    e11 = -beta * (f1p + f2p + c)
                    m = jnp.maximum(jnp.maximum(e01, e10),
                                    jnp.maximum(e11, 0.0))
                    w00 = jnp.exp(-m)
                    w01 = jnp.exp(e01 - m)
                    w10 = jnp.exp(e10 - m)
                    w11 = jnp.exp(e11 - m)
                    Z = w00 + w01 + w10 + w11
                    tp = u_ref[rows1, :] * Z
                    cum2 = w00 + w01
                    cum3 = cum2 + w10
                    new1 = (tp >= cum2).astype(jnp.float32)
                    new2 = (((tp >= w00) & (tp < cum2)) | (tp >= cum3)
                            ).astype(jnp.float32)
                    out_ref[0, rows1, :] = new1
                    out_ref[0, rows2, :] = new2
                    if done + 2 * (q + 1) < k_here:
                        ds2p = jnp.concatenate([new1 - s1, new2 - s2], axis=0)
                        F = F + jnp.dot(Jd[:, j1 : j1 + 2 * P], ds2p,
                                        preferred_element_type=jnp.float32)
                if tail:  # odd trailing variable: single heat-bath draw
                    j1 = (done + 2 * npairs) * P
                    rows = prows(j1)
                    f = F[j1 : j1 + P, :]
                    beta = beta_ref[rows, :][:, 0:1]
                    # u < σ(-βf) ⟺ u·(1+exp(βf)) < 1 (inf-safe)
                    w = jnp.exp(beta * f)
                    out_ref[0, rows, :] = (
                        u_ref[rows, :] * (1.0 + w) < 1.0
                    ).astype(jnp.float32)
                return

            for j in range(k_here):  # static unroll
                rj = r0 + j * P
                rows = pl.ds(pl.multiple_of(rj, 8) if P % 8 == 0 else rj, P)
                s_blk = out_ref[0, rows, :]  # (P, R)
                f = F[j * P : (j + 1) * P, :]
                if rule == "metropolis":
                    c = 1.0 - 2.0 * s_blk  # flip direction ±1
                    delta = c * f
                    accept = delta < u_ref[rows, :]
                    ds = jnp.where(accept, c, 0.0)
                    out_ref[0, rows, :] = s_blk + ds
                else:
                    new = (f < u_ref[rows, :]).astype(jnp.float32)
                    ds = new - s_blk
                    out_ref[0, rows, :] = new
                if pt:
                    # incremental energy: ΔE of the accepted updates
                    E_ref[...] = E_ref[...] + ds * f
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

        if pt:
            # replica exchange: adjacent rungs (alternating parity) swap
            # states with p = min(1, exp(-dβ·dE)) ⟺ dβ·dE < -log(u)
            parity = t % 2
            d_beta = logr[0:P, :]  # (P, 1): per-slot link spacing
            E = E_ref[...]
            E_up = _roll_rows(E, -1)  # E[p+1] on row p
            E_dn = _roll_rows(E, 1)
            if debug:
                usw = swap_all_ref[0, t]  # (P, R)
            else:
                swb = pltpu.bitcast(pltpu.prng_random_bits((P, R)), jnp.uint32)
                usw = pltpu.bitcast(swb >> 8, jnp.int32).astype(jnp.float32) * inv24
            rung = jax.lax.broadcasted_iota(jnp.int32, (P, R), 0) % M
            link_ok = jnp.logical_and(rung < M - 1, (rung % 2) == parity)
            dE = E - E_up
            acc = jnp.logical_and(
                link_ok, d_beta * dE < -jnp.log(usw)
            ).astype(jnp.float32)
            acc_dn = _roll_rows(acc, 1)  # link p-1 accepted, seen from slot p
            E_ref[...] = E + acc * (E_up - E) + acc_dn * (E_dn - E)
            # expand the per-slot swap mask to all N rows (row i*P+p belongs
            # to slot p) via the now-free threshold scratch
            for i in range(stride):  # static unroll
                u_ref[i * P:(i + 1) * P, :] = acc
            if stride * P < N:
                u_ref[stride * P:N, :] = jnp.zeros(
                    (N - stride * P, R), jnp.float32
                )
            m_up = u_ref[...]
            m_dn = _roll_rows(m_up, 1)
            s = out_ref[0]
            s_up = _roll_rows(s, -1)
            s_dn = _roll_rows(s, 1)
            out_ref[0] = s + m_up * (s_up - s) + m_dn * (s_dn - s)
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


def _run_packed(key, Q, num_reads: int, num_sweeps: int, hot_v, logr_v,
                rule: str, M: int = 0, pair: bool = False,
                quad: bool = False,
                interpret: bool = False, debug_randoms=None):
    """Shared packing + pallas_call driver for all three samplers.

    ``hot_v``/``logr_v``: per-problem (B,) schedule params — (β_hot,
    log(β_cold/β_hot)) for annealed rules, (fixed per-slot β, link dβ) for
    PT (``M > 0``, where B counts *expanded* problems = ladders × rungs).
    Returns problem-major samples (B, num_reads, n).
    """
    B, n = Q.shape[0], Q.shape[-1]
    stride, P, N = pack_geometry(n, batch=B, reads=num_reads, min_p=M)
    R = _round_up(num_reads, 128)
    pt = M > 0
    if pt:
        assert P % M == 0, (
            f"PT pack geometry P={P} must be a multiple of num_replicas={M} "
            "(the PTSampler routing pre-checks this)"
        )
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

    pad_fill = jnp.ones((Bp - B,), dtype=jnp.float32)
    hot_v = jnp.concatenate([hot_v.astype(jnp.float32), pad_fill])
    logr_v = jnp.concatenate(
        [logr_v.astype(jnp.float32), jnp.zeros_like(pad_fill) if pt else pad_fill]
    )

    def per_row(v):  # (Bp,) -> (G, N, 1), interleaved: row i*P+p = problem p
        v = jnp.tile(v.reshape(G, 1, P), (1, stride, 1)).reshape(G, P * stride)
        v = jnp.pad(v, ((0, 0), (0, N - P * stride)), constant_values=1.0)
        return v[..., None]

    seed = _pack_seed_table(key, G, P, B)

    debug = debug_randoms is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed table (G, 1), shared
        pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, N), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [seed, per_row(hot_v), per_row(logr_v), J_int]
    if debug:
        if pt:
            init01, uniforms, swap_u = debug_randoms
        else:
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
        if pt:
            # (S, B, reads) per-slot swap uniforms → (G, S, P, R)
            sw = jnp.pad(swap_u.astype(jnp.float32),
                         ((0, 0), (0, Bp - B), (0, R - num_reads)),
                         constant_values=1.0)
            sw_p = jnp.moveaxis(sw.reshape(S, G, P, R), 0, 1)
            in_specs += [
                pl.BlockSpec((1, S, P, R), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [sw_p]

    # Strategy choice (measured on v5e): the masked full-tile update wins on
    # small strides ONLY while the chain block is one lane tile — its
    # (N,N)@(N,R) per-step matmul scales with R, the block-sweep path's
    # is ~flat (mask 8.2ms vs 10.7ms at R=128, but 320ms vs 10.7ms at
    # R=1024; B=120, n=6, 1000 sweeps).  PT and pair updates always use
    # the block path (exchange/pair machinery lives there).
    assert not (pair and quad), "pair and quad updates are exclusive"
    if quad and block_vars(P) < 4:
        quad, pair = False, True  # P=64 fuses 2 vars/block: pairs only
    if pair and block_vars(P) < 2:
        pair = False  # P=128 fuses one var per block: no pairs to form
    use_mask = (stride <= 16 and R <= 128 and not pt and not pair
                and not quad)

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

    scratch_shapes = [pltpu.VMEM((N, R), jnp.float32)]
    if pt:
        scratch_shapes.append(pltpu.VMEM((P, R), jnp.float32))
    elif pair or quad:
        scratch_shapes.append(pltpu.VMEM((N, 128), jnp.float32))  # beta rows

    out = pl.pallas_call(
        partial(_sa_kernel, n=n, P=P, num_sweeps=num_sweeps,
                use_mask=use_mask, rule=rule, M=M, stride=stride, pair=pair,
                quad=quad, debug=debug),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, R), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)

    # (G, N, R): row i*P+p -> (G, stride, P, R) -> problem-major (Bp, stride, R)
    out = out[:, : P * stride, :].reshape(G, stride, P, R)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(Bp, stride, R)
    return jnp.swapaxes(out[:B, :n, :num_reads], 1, 2)


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
    beta_hot, beta_cold = default_beta_range(Q)  # (B,)
    if num_sweeps == 1:
        beta_hot = beta_cold  # match sa_jax: a single sweep runs cold
    logr = jnp.log(beta_cold.astype(jnp.float32) / beta_hot.astype(jnp.float32))
    return _run_packed(key, Q, num_reads, num_sweeps, beta_hot, logr,
                       "metropolis", interpret=interpret,
                       debug_randoms=debug_randoms)


@partial(jax.jit, static_argnames=("num_reads", "num_warmup", "pair",
                                   "quad", "interpret"))
def gibbs_sample_batch_pallas(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_warmup: int = 64,
    beta: float = 1.0,
    pair: bool = False,
    quad: bool = False,
    interpret: bool = False,
    debug_randoms=None,
) -> jax.Array:
    """Batched annealed heat-bath ("BMS") on TPU: (B, n, n) → (B, reads, n).

    Semantics match :func:`qbmx.samplers.gibbs.gibbs_sample_batch`: each
    read is an independent chain annealed from ``min(default_hot, beta)``
    to the target ``beta`` over ``num_warmup`` sweeps, then read out once.
    Only the execution strategy differs (packed block-sweep kernel vs the
    XLA one-variable-per-step path — VERDICT r2 "What's weak" #1: the XLA
    path made the BMS 10-seed sweep ~25× slower than SA's).

    ``pair=True`` resamples consecutive variable PAIRS from their exact
    4-state conditionals (semantics = ``gibbs._pair_heat_bath_sweep``) —
    half the sequential sub-steps per sweep; silently ignored when the
    pack geometry fuses only one variable per block (P=128).
    ``quad=True`` widens to variable QUADRUPLES from their exact 16-state
    conditionals (semantics = ``gibbs._quad_heat_bath_sweep``) — quarter
    the sub-steps; silently demoted to pairs when the geometry fuses
    fewer than 4 variables per block (P=64).
    """
    hot0, _ = default_beta_range(Q)
    beta_t = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), hot0.shape)
    beta_hot = jnp.minimum(hot0.astype(jnp.float32), beta_t)
    if num_warmup == 1:
        beta_hot = beta_t  # single sweep runs at the target temperature
    logr = jnp.log(beta_t / beta_hot)
    return _run_packed(key, Q, num_reads, num_warmup, beta_hot, logr,
                       "heatbath", pair=pair, quad=quad, interpret=interpret,
                       debug_randoms=debug_randoms)


@partial(jax.jit, static_argnames=("num_reads", "num_sweeps", "num_replicas",
                                   "interpret"))
def pt_sample_batch_pallas(
    key: jax.Array,
    Q: jax.Array,
    num_reads: int,
    num_sweeps: int = 64,
    num_replicas: int = 8,
    beta_target: float = 1.0,
    interpret: bool = False,
    debug_randoms=None,
) -> jax.Array:
    """Batched parallel tempering on TPU: (B, n, n) → (B, num_reads, n).

    Semantics match :func:`qbmx.samplers.tempering.pt_sample_batch`: per
    read, ``num_replicas`` rungs on a geometric beta grid from
    ``min(default_hot, beta_target/2)`` to ``beta_target`` run heat-bath
    sweeps with alternating-parity replica exchange; the target rung is
    returned.  Rungs are packed as consecutive pack slots, so the exchange
    is a masked sublane roll (see module docstring).

    ``num_replicas`` must divide the pack geometry's P (powers of two ≤ P;
    the PTSampler routing pre-checks and falls back to XLA otherwise).

    ``debug_randoms`` (CI path): ``(init01, uniforms, swap_u)`` with the
    first two shaped for the *expanded* problem axis (B·M) and
    ``swap_u`` (num_sweeps, B·M, num_reads).
    """
    B = Q.shape[0]
    M = num_replicas
    hot0, _ = default_beta_range(Q)
    bt = jnp.asarray(beta_target, jnp.float32)
    beta_hot = jnp.minimum(hot0.astype(jnp.float32), bt * 0.5)
    t = jnp.arange(M, dtype=jnp.float32) / max(M - 1, 1)
    log_hot = jnp.log(beta_hot)[:, None]
    betas = jnp.exp(log_hot + t[None, :] * (jnp.log(bt) - log_hot))  # (B, M)
    dbeta = jnp.pad(betas[:, 1:] - betas[:, :-1], ((0, 0), (0, 1)))  # last link unused
    Qx = jnp.repeat(Q, M, axis=0)  # (B*M, n, n): slot b*M+m = problem b rung m
    out = _run_packed(key, Qx, num_reads, num_sweeps, betas.reshape(-1),
                      dbeta.reshape(-1), "heatbath", M=M,
                      interpret=interpret, debug_randoms=debug_randoms)
    return out[M - 1::M]  # the target-beta rung of each ladder
