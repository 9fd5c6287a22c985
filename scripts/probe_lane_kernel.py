"""Hardware A/B: lane-stacked shared-J kernel vs packed kernel vs XLA.

Every qbmx QUBO family shares couplings across the batch (only linear
terms vary per example), which is the structural assumption behind
``qbmx.samplers.sa_lane``.  This probe measures it on the real TPU against
the packed block-sweep kernel and the XLA sampler on DENSIFIED equivalents
of the same problems, at the shapes that drive routing:

  * B=600  n=41 R=100  — large-batch few-reads (currently XLA-routed)
  * B=1200 n=6  R=128  — large-batch few-reads, tiny n (XLA-routed)
  * B=1200 n=6  R=1000 — many-reads (packed-routed, P=32)
  * B=2160 n=9  R=1000 — BMS search sweep shape (packed-routed)
  * B=60   n=41 R=100  — CDQBM stack shape (packed-routed, P=64)
  * B=200  n=717 R=100 — CDQBM probabilistic-pooling shape: --big times
                          the lane kernel there; add --bigpacked to ALSO
                          time the packed kernel at that shape (its first
                          call is a 200-program compile storm that can
                          crash the axon worker — CLAUDE.md — so it is
                          opt-in separately)

Timing protocol per CLAUDE.md: queued bursts drained by ONE scalar fetch,
warm-up call excluded, run EXCLUSIVELY (no other TPU process).  Also
validates the on-chip PRNG path statistically against the exact oracle.

    python scripts/probe_lane_kernel.py [--big] [--bigpacked] [--sa] [--groups]

``--groups`` adds multi-group shapes (G=2 model steps, G=20 sweeps) —
ADVICE r3: the G=1 measurements behind ``_lane_preferred`` were applied at
G>1 by linear extrapolation; these probe the extrapolation directly.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qbmx.core.qubo import random_qubo_batch
from qbmx.samplers.exact import exact_boltzmann
from qbmx.samplers.sa_jax import sa_sample_batch
from qbmx.samplers.gibbs import gibbs_sample_batch  # noqa: F401 (XLA ref)
from qbmx.samplers.sa_lane import lane_geometry, lane_sample_groups
from qbmx.samplers.sa_pallas import (
    gibbs_sample_batch_pallas,
    pack_geometry,
    sa_sample_batch_pallas,
)

# (B, n, R, sweeps)
SHAPES = [
    (600, 41, 100, 100),
    (1200, 6, 128, 1000),
    (1200, 6, 1000, 1000),
    (2160, 9, 1000, 64),
    (60, 41, 100, 1000),
]
BIG = (200, 717, 100, 100)


def make_problem(rng, B, n):
    """One shared-coupling group: Q_shared (1, n, n) + per-problem h."""
    Qs = random_qubo_batch(rng, 1, n)
    h = jnp.asarray(rng.normal(size=(1, B, n)).astype(np.float32))
    dense = Qs[:, None] + jax.vmap(jax.vmap(jnp.diagflat))(h)
    return Qs, h, dense.reshape(B, n, n)


def timed(run, reps=10):
    def run_many(n_reps, base):
        acc = jnp.float32(0)
        for i in range(n_reps):
            acc = acc + run(base + i).sum()
        return float(acc)  # one scalar fetch drains the queue

    run_many(1, 0)  # compile + warmup
    t0 = time.perf_counter(); run_many(1, 50); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_many(reps + 1, 100); tn = time.perf_counter() - t0
    return (tn - t1) / reps


def probe(B, n, R, S, rng, rule="heatbath", with_packed=True, reps=10):
    Qs, h, Qd = make_problem(rng, B, n)
    bh = jnp.full((1, B), 0.3)
    bc = jnp.full((1, B), 1.0)
    if rule == "heatbath":
        t_lane = timed(lambda i: lane_sample_groups(
            jax.random.key(i), Qs, h, R, S, rule="heatbath",
            beta_hot=bh, beta_cold=bc), reps)
        t_pack = timed(lambda i: gibbs_sample_batch_pallas(
            jax.random.key(i), Qd, R, S, 1.0), reps) if with_packed else float("nan")
        t_pair = timed(lambda i: gibbs_sample_batch_pallas(
            jax.random.key(i), Qd, R, S, 1.0, pair=True), reps) if with_packed else float("nan")
        t_xla = float("nan")  # XLA heat-bath ~= XLA SA per sweep; SA row below
    else:
        t_lane = timed(lambda i: lane_sample_groups(
            jax.random.key(i), Qs, h, R, S, rule="metropolis"), reps)
        t_pack = timed(lambda i: sa_sample_batch_pallas(
            jax.random.key(i), Qd, R, S), reps) if with_packed else float("nan")
        t_pair = float("nan")
        t_xla = timed(lambda i: sa_sample_batch(
            jax.random.key(i), Qd, R, S), reps=min(reps, 3))
    npad, Lc, C, fold = lane_geometry(n, B, R)
    _, P, N = pack_geometry(n, batch=B, reads=R)
    print(
        f"B={B:5d} n={n:3d} R={R:4d} S={S:4d} [{rule:10s}] "
        f"lane {t_lane*1e3:8.1f} ms (C={C} fold={fold}) | "
        f"packed {t_pack*1e3:8.1f} ms (P={P}) | pair {t_pair*1e3:8.1f} ms | "
        f"xla-sa {t_xla*1e3:8.1f} ms",
        flush=True,
    )


def make_group_problem(rng, G, B, n):
    """G shared-coupling groups (per-group Q + per-problem h) + the dense
    (G·B, n, n) equivalent — the shape a training step (G=2 phases) or a
    seed-parallel sweep (G=2S) hands sampler_sample_groups."""
    Qs = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    dense = Qs[:, None] + jax.vmap(jax.vmap(jnp.diagflat))(h)
    return Qs, h, dense.reshape(G * B, n, n)


def probe_groups(G, B, n, R, S, rng, reps=10):
    """Lane vs packed+pair at G > 1 (ADVICE r3: every routing measurement
    behind _lane_preferred used G=1; production applies the rule at G=2
    (model steps) and G=2S (sweeps) by extrapolation)."""
    Qs, h, Qd = make_group_problem(rng, G, B, n)
    bh = jnp.full((G, B), 0.3)
    bc = jnp.full((G, B), 1.0)
    t_lane = timed(lambda i: lane_sample_groups(
        jax.random.key(i), Qs, h, R, S, rule="heatbath",
        beta_hot=bh, beta_cold=bc), reps)
    t_pack = timed(lambda i: gibbs_sample_batch_pallas(
        jax.random.key(i), Qd, R, S, 1.0, pair=True), reps)
    npad, Lc, C, fold = lane_geometry(n, B, R, groups=G)
    _, P, N = pack_geometry(n, batch=G * B, reads=R)
    from qbmx.samplers.api import _lane_preferred

    routed = "lane" if _lane_preferred(n, B, R, G) else "packed/xla"
    print(
        f"G={G:3d} B={B:5d} n={n:3d} R={R:4d} S={S:4d} [heatbath ] "
        f"lane {t_lane*1e3:8.1f} ms (G*C={G * C} fold={fold}) | "
        f"packed+pair {t_pack*1e3:8.1f} ms ({-(-G * B // P)} programs P={P})"
        f" | routed={routed}",
        flush=True,
    )


# (G, B, n, R, S): model steps are G=2; 10-seed sweeps are G=20
GROUP_SHAPES = [
    (2, 60, 41, 100, 1000),   # CDQBM-class training step
    (2, 256, 41, 100, 100),   # the formerly-untested G=2 single-chunk band
    (2, 470, 41, 100, 100),   # upper edge of that band
    (20, 60, 9, 100, 100),    # few-reads 10-seed sweep step
    (20, 60, 6, 1000, 64),    # BMS breastmnist sweep step (packed-routed)
]


def quality(rng, reads=4096, warmup=64, n=6, B=8):
    """On-chip PRNG path vs exact oracle marginals at beta=1."""
    Qs, h, Qd = make_problem(rng, B, n)
    s = lane_sample_groups(jax.random.key(7), Qs, h, reads, warmup,
                           rule="heatbath",
                           beta_hot=jnp.full((1, B), 0.3),
                           beta_cold=jnp.full((1, B), 1.0))[0]
    errs = []
    for b in range(B):
        marg = exact_boltzmann(Qd[b], beta=1.0)[2]
        errs.append(np.abs(np.asarray(s[b]).mean(axis=0) - np.asarray(marg)).mean())
    return float(np.mean(errs))


def main(argv):
    rng = np.random.default_rng(13)
    print(f"devices: {jax.devices()}")
    q = quality(rng)
    print(f"oracle agreement (mean |marg err|, n=6 beta=1): lane {q:.4f}")
    for B, n, R, S in SHAPES:
        probe(B, n, R, S, rng)
    if "--sa" in argv:
        for B, n, R, S in SHAPES[:2]:
            probe(B, n, R, S, rng, rule="metropolis")
    if "--big" in argv:
        B, n, R, S = BIG
        probe(B, n, R, S, rng, with_packed="--bigpacked" in argv, reps=3)
    if "--groups" in argv:
        for G, B, n, R, S in GROUP_SHAPES:
            probe_groups(G, B, n, R, S, rng)


if __name__ == "__main__":
    main(sys.argv[1:])
