"""Uniform sampler interface + registry.

The reference dispatches on solver strings at ``src/model/faster_dqbm.py:571-684``
("SA" / "BMS" / D-Wave names) and wraps the modular version in
``LocalSASampler`` / ``DWaveAdapter`` (``src/qubo/sampler.py:19-51``).  Here a
sampler is a small config object with one method:

    sample_batch(key, Q, num_reads) -> (B, num_reads, n) float32 in {0,1}

where ``Q`` is a batch (B, n, n) of dense upper-triangular QUBOs.  Solver
names accepted by :func:`get_sampler` keep the reference CLI vocabulary:
``"SA"`` (annealed Metropolis, Pallas kernel on TPU / pure JAX elsewhere),
``"SA-JAX"`` (force the pure-JAX path), ``"BMS"`` (annealed heat-bath
Boltzmann sampler), ``"EXACT"`` (enumeration oracle, n ≤ 20).  D-Wave solver
names raise with a pointer to the QPU adapter seam — there is deliberately no
cloud dependency (BASELINE.json: "no Ocean SDK or cloud secrets").
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

import jax
import jax.numpy as jnp

from qbmx.samplers import exact as _exact
from qbmx.samplers import gibbs as _gibbs
from qbmx.samplers import sa_jax as _sa_jax


class Sampler(Protocol):
    def sample_batch(self, key: jax.Array, Q: jax.Array, num_reads: int) -> jax.Array:
        """(B, n, n) QUBOs → (B, num_reads, n) binary samples."""
        ...


def sampler_jit_safe(sampler) -> bool:
    """Capability flag: can ``sample_batch`` be traced inside jit?

    Declared by the sampler itself (``jit_safe`` attribute/property,
    default True).  False for host-bound samplers — the QPU adapter (each
    sample is a network call) and the native C++ sampler off-CPU (the axon
    runtime rejects host callbacks).  Models build their training step
    EAGERLY for such samplers instead of special-casing sampler types."""
    return bool(getattr(sampler, "jit_safe", True))


def sampler_scan_safe(sampler, n: int, num_reads: int) -> bool:
    """Capability flag: can ``sample_batch`` live inside ``lax.scan``?

    Implies jit-safety.  SASampler declines when it would route to a
    Pallas kernel (the PACKED kernel inside lax.scan hangs the axon AOT
    compiler — CLAUDE.md; this B=1 metadata probe cannot prove the real
    batch routes to the scan-safe LANE kernel, so it stays conservative —
    exact-shape callers use sampler_scan_safe_groups); other samplers
    default to their jit-safety."""
    if not sampler_jit_safe(sampler):
        return False
    scan_safe = getattr(sampler, "scan_safe", None)
    return bool(scan_safe(n, num_reads)) if scan_safe is not None else True


def sampler_scan_safe_groups(sampler, n: int, num_problems: int,
                             num_reads: int, groups: int = 2) -> bool:
    """Can a ``sampler_sample_groups`` call with these EXACT shapes live
    inside ``lax.scan``?

    The packed kernel hangs the axon AOT compiler under scan (CLAUDE.md),
    but the LANE kernel compiles, persists in the compilation cache, and
    runs — measured at the CDQBM sweep shape: first call in a fresh
    process 5.5 s vs 46.4 s for the 40×-unrolled program (which re-pays
    ~41 s of tracing/lowering every process), warm epochs a wash
    (1.98 vs 2.10 s), cache entry 35× smaller (PERFORMANCE.md §2).
    True iff the routed path for the exact shapes is
    the lane kernel or a pure-XLA fallback — callers therefore pass the
    REAL training shapes, not probes (a B=1 probe could route lane while
    the real batch routes packed, which would hang)."""
    if not sampler_jit_safe(sampler):
        return False
    fn = getattr(sampler, "scan_safe_groups", None)
    if fn is not None:
        return bool(fn(n, num_problems, num_reads, groups))
    scan_safe = getattr(sampler, "scan_safe", None)
    return bool(scan_safe(n, num_reads)) if scan_safe is not None else True


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _pack_fits_vmem(n: int, B: int, num_reads: int, min_p: int = 1) -> bool:
    """Does the CHOSEN pack geometry fit the kernel's VMEM rules?  A single
    pack gets the full budget; a multi-pack grid double-buffers its blocks
    under the compiler's 16 MiB scoped-VMEM limit (pack_geometry enforces
    the same split, but its P=1 fallback can still exceed it — callers
    decline here so such shapes go to XLA instead of a compile-time OOM).
    ``min_p``: forwarded to ``pack_geometry`` (PT passes its rung count so
    the fit is judged at the geometry the PT route actually uses) — the
    ONE copy of the budget formulas for the SA/BMS and PT routes."""
    from qbmx.samplers.sa_pallas import _VMEM_BUDGET, pack_geometry

    stride, P, N = pack_geometry(n, batch=B, reads=num_reads, min_p=min_p)
    R = -(-num_reads // 128) * 128
    if B > P:  # multi-pack grid
        return 4 * (2 * N * N + 3 * N * R) <= 15 * 2**20
    return 4 * (N * N + 2 * N * R) <= _VMEM_BUDGET


def densify_groups(Q_shared, h_extra):
    """(G, n, n) shared QUBOs + (G, B, n) per-problem linear terms → the
    (G*B, n, n) dense batch they represent (fallback path for samplers
    without a structured fast path)."""
    n = Q_shared.shape[-1]
    diag = jax.vmap(jax.vmap(jnp.diagflat))(h_extra.astype(jnp.float32))
    return (Q_shared[:, None] + diag).reshape(-1, n, n)


def sampler_sample_groups(sampler, key, Q_shared, h_extra, num_reads):
    """Structured shared-coupling sampling: every qbmx QUBO family shares
    its couplings across the batch (only linear terms vary per example —
    see qbmx.samplers.sa_lane), so models hand samplers ``Q_shared``
    (G, n, n) + ``h_extra`` (G, B, n) instead of G·B dense matrices.
    Samplers with a ``sample_groups`` method (SA/BMS lane kernel) exploit
    the structure; everything else densifies and runs ``sample_batch``.
    Returns (G, B, num_reads, n)."""
    fn = getattr(sampler, "sample_groups", None)
    if fn is not None:
        return fn(key, Q_shared, h_extra, num_reads)
    G, B, n = h_extra.shape
    keys = key.reshape(-1) if key.ndim else key
    flat = sampler.sample_batch(keys, densify_groups(Q_shared, h_extra), num_reads)
    return flat.reshape(G, B, num_reads, n)


def _lane_preferred(n: int, num_problems: int, num_reads: int,
                    groups: int = 1) -> bool:
    """Measured lane-vs-packed routing (v5e, scripts/probe_lane_kernel.py;
    PERFORMANCE.md §1).  The lane kernel wins every few-reads shape — its
    sequential program count stays far below the packed grid's (B=600 n=41
    R=100: 8.4 vs 19.2 ms; B=1200 n=6 R=128: 9.9 vs 49.2 ms; B=60 n=41
    R=100: 4.0 vs 13.9 ms vs the best dense alternative; n=717 B=200:
    222 vs 944 ms).  At many reads a lane program costs ~3-4× a packed
    program per sweep (huge per-chunk lane slabs: B=120 n=6 R=1000 is a
    tie at 1 lane vs 4 packed programs; C=5 vs 13 and C=14 vs 38 both
    lose), so lane is kept only while its TOTAL program count (groups ×
    per-group chunks) stays under a third of the packed grid's."""
    from qbmx.samplers.sa_lane import lane_geometry
    from qbmx.samplers.sa_pallas import pack_geometry

    _, Lc, C, _ = lane_geometry(n, num_problems, num_reads, groups=groups)
    if Lc == 0:
        return False
    total = groups * num_problems
    _, P, _ = pack_geometry(n, batch=total, reads=num_reads)
    packed_programs = -(-total // P)
    if num_reads <= 256:
        # guard the unmeasured degenerate corner (n_pad near the fold-1
        # VMEM limit collapses Lc toward its 128-lane floor and the chunk
        # count balloons): at equal slab sizes a lane program is no cheaper
        # than a packed one, so decline once lane needs 2× the programs.
        return groups * C <= 2 * packed_programs
    return 3 * groups * C <= packed_programs


def _lane_enabled(sampler, n: int, B: int, num_reads: int,
                  groups: int = 1) -> bool:
    """Lane-route predicate shared by SASampler/GibbsSampler: respects the
    sampler's ``use_pallas`` override, requires a TPU, then applies the
    measured routing rule."""
    if sampler.use_pallas is False or not _on_tpu():
        return False
    return _lane_preferred(n, B, num_reads, groups)


def _scan_safe_groups(sampler, n: int, num_problems: int, num_reads: int,
                      groups: int) -> bool:
    """One copy of the exact-shape scan-safety rule for SA/Gibbs (like
    _sample_groups, so the two samplers cannot drift): the lane kernel is
    scan-safe (measured — sampler_scan_safe_groups), the packed kernel is
    not (axon AOT hang), pure XLA is."""
    if _lane_enabled(sampler, n, num_problems, num_reads, groups):
        return True
    probe = jax.ShapeDtypeStruct((groups * num_problems, n, n), jnp.float32)
    return not sampler._pallas_enabled(probe, num_reads)


def _sample_groups(sampler, key, Q_shared, h_extra, num_reads, lane_fn):
    """Shared lane-vs-densify body for SA/Gibbs ``sample_groups`` (ONE copy
    of the fallback so key handling / routing cannot drift between the two
    samplers).  ``lane_fn(key, Q_shared, h_extra)`` runs the rule-specific
    lane kernel call."""
    G, B = h_extra.shape[:2]
    if _lane_enabled(sampler, int(Q_shared.shape[-1]), B, num_reads, G):
        return lane_fn(key, Q_shared, h_extra)
    keys = key.reshape(-1) if key.ndim else key
    flat = sampler.sample_batch(keys, densify_groups(Q_shared, h_extra),
                                num_reads)
    return flat.reshape(G, B, num_reads, int(Q_shared.shape[-1]))


def _auto_route_packed(Q, num_reads: int, use_pallas: bool | None) -> bool:
    """Shared SA/BMS Pallas-vs-XLA routing (the two rules share the packed
    kernel machinery and their XLA fallbacks share the one-variable-per-
    step structure, so the measured crossover points carry over)."""
    if use_pallas is not None:
        return use_pallas
    if not _on_tpu():
        return False
    # Large batches with few reads belong to the XLA sampler: its
    # batched-matvec VPU path does only USEFUL work and saturates with
    # batch, while the packed kernel pays a 1/P useful-flop ratio per
    # pack and runs packs sequentially.  Measured on v5e (1000-sweep
    # equiv): B=600 n=41 R=100 xla 2.2x faster (192 vs 420 us/sweep);
    # B=1200 n=6 R=128 xla 1.4x (49 vs 71 ms).  With many reads the
    # kernel's per-read cost is ~flat while xla's is linear in R, so
    # Pallas keeps those (B=1200 n=6 R=1000: pallas 4x faster).
    B = int(Q.shape[0])
    if num_reads <= 128 and B >= 256:
        return False
    return _pack_fits_vmem(int(Q.shape[-1]), B, num_reads)


@dataclasses.dataclass(frozen=True)
class SASampler:
    """Annealed Metropolis sampler (neal-equivalent). ``num_sweeps`` matches
    the reference's ``anneal_steps`` knob."""

    num_sweeps: int = 1000
    use_pallas: bool | None = None  # None = auto (Pallas on TPU for small QUBOs)

    def sample_batch(self, key, Q, num_reads):
        if self._pallas_enabled(Q, num_reads):
            from qbmx.samplers import sa_pallas

            return sa_pallas.sa_sample_batch_pallas(key, Q, num_reads, self.num_sweeps)
        return _sa_jax.sa_sample_batch(key, Q, num_reads, self.num_sweeps)

    def sample_groups(self, key, Q_shared, h_extra, num_reads):
        """Structured shared-coupling path (see sampler_sample_groups):
        lane kernel on TPU when the shape fits, dense fallback otherwise."""
        from qbmx.samplers import sa_lane

        return _sample_groups(
            self, key, Q_shared, h_extra, num_reads,
            lambda k, Q, h: sa_lane.lane_sample_groups(
                k, Q, h, num_reads, self.num_sweeps, rule="metropolis"),
        )


    def scan_safe_groups(self, n: int, num_problems: int, num_reads: int,
                         groups: int = 2) -> bool:
        return _scan_safe_groups(self, n, num_problems, num_reads, groups)

    def scan_safe(self, n: int, num_reads: int) -> bool:
        """lax.scan-compatible iff not routed to the Pallas kernel (axon
        AOT hang).  Probed with shape metadata only — no device alloc."""
        probe = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        return not (self._pallas_enabled(probe, num_reads)
                    or _lane_enabled(self, n, 1, num_reads))

    def _pallas_enabled(self, Q, num_reads: int = 128) -> bool:
        return _auto_route_packed(Q, num_reads, self.use_pallas)


@dataclasses.dataclass(frozen=True)
class GibbsSampler:
    """Annealed heat-bath sampler — the "BMS" solver equivalent.  Routes to
    the packed Pallas kernel's heat-bath rule on TPU (VERDICT r2 #1: the
    XLA one-variable-per-step path made BMS ~25× slower than SA).

    ``pair_updates``: resample consecutive variable PAIRS from their exact
    4-state conditionals instead of one variable at a time — half the
    sequential sub-steps per sweep (the kernel's measured floor), same
    stationary distribution (sequential-scan pair Gibbs).  ``None`` (the
    default) enables pairs on the packed-kernel route — a measured
    1.17–3.4× with oracle agreement unchanged
    (out/parity/pair_gibbs_ab_r3.log) — and keeps the XLA path on
    single-variable sweeps; pass True/False to force both paths.

    ``quad_updates``: widen the joint update to variable QUADRUPLES
    (exact 16-state conditionals) — quarter the sub-step chain at 4× the
    per-sub-step element work, which pays in the kernel's issue-latency-
    bound regime.  ``True`` forces quads on both routes (demoted to pairs
    when the pack fuses < 4 vars/block); ``False``/``None`` keeps the
    pair default.  Takes precedence over ``pair_updates`` when set."""

    num_warmup: int = 64
    beta: float = 1.0
    use_pallas: bool | None = None
    pair_updates: bool | None = None
    quad_updates: bool | None = None

    def sample_batch(self, key, Q, num_reads):
        quad = self.quad_updates is True
        if self._pallas_enabled(Q, num_reads):
            from qbmx.samplers import sa_pallas

            return sa_pallas.gibbs_sample_batch_pallas(
                key, Q, num_reads, self.num_warmup, self.beta,
                pair=not quad and self.pair_updates is not False,
                quad=quad,
            )
        return _gibbs.gibbs_sample_batch(key, Q, num_reads, self.num_warmup,
                                         self.beta,
                                         pair=not quad and bool(self.pair_updates),
                                         quad=quad)

    def sample_groups(self, key, Q_shared, h_extra, num_reads):
        """Structured shared-coupling path (see sampler_sample_groups).
        The lane kernel has no quad variant (pair measured only 1.2–1.3×
        there — the lane regime is not sub-step-latency-bound the way the
        packed one is), so ``quad_updates`` rides as pairs here; the
        densify fallback honors it via :meth:`sample_batch`."""
        from qbmx.samplers import sa_lane

        return _sample_groups(
            self, key, Q_shared, h_extra, num_reads,
            lambda k, Q, h: sa_lane.lane_sample_groups(
                k, Q, h, num_reads, self.num_warmup, rule="heatbath",
                beta_cold=jnp.full(h.shape[:2], self.beta, dtype=jnp.float32),
                # quad precedence: quad_updates=True demotes to PAIRS here
                # (no lane quad variant) even when pair_updates=False
                pair=(self.quad_updates is True
                      or self.pair_updates is not False)),
        )


    def scan_safe_groups(self, n: int, num_problems: int, num_reads: int,
                         groups: int = 2) -> bool:
        return _scan_safe_groups(self, n, num_problems, num_reads, groups)

    def scan_safe(self, n: int, num_reads: int) -> bool:
        probe = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        return not (self._pallas_enabled(probe, num_reads)
                    or _lane_enabled(self, n, 1, num_reads))

    def _pallas_enabled(self, Q, num_reads: int = 128) -> bool:
        return _auto_route_packed(Q, num_reads, self.use_pallas)


@dataclasses.dataclass(frozen=True)
class PTSampler:
    """Parallel-tempering (replica exchange) sampler at a target beta —
    better mixing than one-way annealing on frustrated landscapes.  On TPU
    the ladders ride the packed kernel (rungs as pack slots, in-kernel
    exchange) whenever ``num_replicas`` is a power of two dividing the pack
    geometry; otherwise the XLA path runs.  There is deliberately no lane
    (shared-coupling) variant: the rung-exchange machinery lives in the
    packed kernel, and PT workloads are many-reads shapes where the packed
    route wins anyway (PERFORMANCE.md §1) — structured ``sample_groups``
    calls reach PT through the densify fallback.  Measured (r4, 10-seed
    breastmnist training A/B, ``out/parity/pt_training_ab.log``): PT via
    densify reaches the same metric band as BMS with no time or memory
    penalty (386 s vs the BMS leg's 758 s in the same window)."""

    num_sweeps: int = 64
    num_replicas: int = 8
    beta_target: float = 1.0
    use_pallas: bool | None = None

    def sample_batch(self, key, Q, num_reads):
        if self._pallas_enabled(Q, num_reads):
            from qbmx.samplers import sa_pallas

            return sa_pallas.pt_sample_batch_pallas(
                key, Q, num_reads, self.num_sweeps,
                self.num_replicas, self.beta_target,
            )
        from qbmx.samplers.tempering import pt_sample_batch

        return pt_sample_batch(key, Q, num_reads, self.num_sweeps,
                               self.num_replicas, self.beta_target)

    def scan_safe(self, n: int, num_reads: int) -> bool:
        probe = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        return not self._pallas_enabled(probe, num_reads)

    def scan_safe_groups(self, n: int, num_problems: int, num_reads: int,
                         groups: int = 2) -> bool:
        """PT has no lane variant: structured calls densify to a
        (groups·num_problems, n, n) batch, so scan-safety must be judged
        at THAT batch — a B=1 probe could route XLA (scan looks safe)
        while the real batch routes the packed kernel, the axon-AOT scan
        hang ``sampler_scan_safe_groups`` exists to prevent."""
        probe = jax.ShapeDtypeStruct((groups * num_problems, n, n),
                                     jnp.float32)
        return not self._pallas_enabled(probe, num_reads)

    def _pallas_enabled(self, Q, num_reads: int = 128) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        if not _on_tpu():
            return False
        M = self.num_replicas
        if M < 2 or (M & (M - 1)):
            return False  # rung packing needs a power-of-two ladder
        from qbmx.samplers.sa_pallas import pack_geometry

        n = int(Q.shape[-1])
        B = int(Q.shape[0]) * M  # expanded problem axis: ladders × rungs
        stride, P, N = pack_geometry(n, batch=B, reads=num_reads, min_p=M)
        if P % M:
            return False  # ladders would straddle pack boundaries
        # No large-batch XLA preference here: the XLA PT path pays M rungs
        # of the slow per-variable scan, so the kernel wins whenever it fits.
        return _pack_fits_vmem(n, B, num_reads, min_p=M)


@dataclasses.dataclass(frozen=True)
class ExactSampler:
    """Exact enumeration oracle (n ≤ 20). The test anchor for everything else."""

    beta: float = 1.0

    def sample_batch(self, key, Q, num_reads):
        B = Q.shape[0]
        keys = key if key.ndim else jax.random.split(key, B)
        return jax.vmap(lambda k, q: _exact.exact_sample(k, q, num_reads, self.beta))(keys, Q)


def get_sampler(solver: str, num_sweeps: int = 1000, **kwargs) -> Sampler:
    """Solver-string registry.  ``num_sweeps`` means *sweeps per read* for
    EVERY solver (the reference's ``anneal_steps`` knob): SA anneal sweeps,
    BMS warmup sweeps, PT sweeps at the target temperature.  Passing the
    legacy ``num_warmup`` kwarg still overrides the sweep count for BMS/PT
    (deprecated alias, kept so round-1 call sites don't change meaning)."""
    s = solver.upper()
    if s == "SA":
        return SASampler(num_sweeps=num_sweeps, use_pallas=kwargs.get("use_pallas"))
    if s == "SA-PALLAS":
        return SASampler(num_sweeps=num_sweeps, use_pallas=True)
    if s == "SA-JAX":
        return SASampler(num_sweeps=num_sweeps, use_pallas=False)
    if s == "SA-NATIVE":
        # Off-CPU the sampler declares jit_safe=False (the axon runtime
        # rejects host callbacks), so models build their training step
        # eagerly and sampling runs host-side on concrete arrays.
        from qbmx.samplers.native import NativeSASampler

        return NativeSASampler(num_sweeps=num_sweeps)
    if s == "BMS":
        return GibbsSampler(
            num_warmup=kwargs.get("num_warmup", num_sweeps),
            beta=kwargs.get("beta", 1.0),
            use_pallas=kwargs.get("use_pallas"),
            pair_updates=kwargs.get("pair_updates"),
            quad_updates=kwargs.get("quad_updates"),
        )
    if s == "PT":
        return PTSampler(
            num_sweeps=kwargs.get("num_warmup", num_sweeps),
            num_replicas=kwargs.get("num_replicas", 8),
            beta_target=kwargs.get("beta", 1.0),
            use_pallas=kwargs.get("use_pallas"),
        )
    if s == "EXACT":
        return ExactSampler(beta=kwargs.get("beta", 1.0))
    if s.startswith("ADVANTAGE") or s.startswith("DW_"):
        # dimod-compatible adapter: works iff the Ocean SDK is installed,
        # otherwise raises with guidance (still no hard dependency).
        # ``embedding="first_party"`` (the default) wraps the RAW structured
        # sampler and runs qbmx's own cached, partition-aware embedding
        # pipeline (qbmx.embedding); ``embedding="composite"`` keeps the
        # r2-era EmbeddingComposite delegation.
        if kwargs.get("embedding", "first_party") == "composite":
            from qbmx.samplers.qpu import QPUSampler

            return QPUSampler.from_ocean(solver, token=kwargs.get("token"),
                                         copies=kwargs.get("copies", 1))
        from qbmx.samplers.qpu import StructuredQPUSampler

        return StructuredQPUSampler.from_ocean(
            solver, token=kwargs.get("token"), copies=kwargs.get("copies", 1),
            cache_dir=kwargs.get("cache_dir"),
            chain_strength=kwargs.get("chain_strength"))
    if s == "FUJITSUDAU":
        raise NotImplementedError(
            f"QPU solver {solver!r}: qbmx is annealer-free by design. Pass any "
            "dimod-style sampler to qbmx.samplers.qpu.QPUSampler to adapt "
            "external hardware."
        )
    raise ValueError(
        f'Unknown solver {solver!r}. Valid: "SA", "SA-JAX", "SA-PALLAS", '
        '"SA-NATIVE", "BMS", "PT", "EXACT", or a D-Wave solver name with '
        "the Ocean SDK installed."
    )
