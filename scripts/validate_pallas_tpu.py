"""On-TPU validation + benchmark of the Pallas SA kernel.

Run on real hardware (needs a TPU; the kernel's on-chip PRNG has no
interpreter support):  ``python scripts/validate_pallas_tpu.py``

Checks the packed kernel's sample statistics against the exact Boltzmann
oracle and against the XLA sampler, then reports per-call latency for
representative shapes (timing via a single scalar fetch after a queued run
burst — plain block_until_ready does not flush the axon tunnel).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from qbmx.core.qubo import default_beta_range, random_qubo_batch
from qbmx.samplers.exact import exact_boltzmann
from qbmx.samplers.gibbs import gibbs_sample_batch
from qbmx.samplers.sa_jax import sa_sample_batch
from qbmx.samplers.sa_pallas import (
    gibbs_sample_batch_pallas,
    pt_sample_batch_pallas,
    sa_sample_batch_pallas,
)
from qbmx.samplers.tempering import pt_sample_batch


def validate(B=60, n=6, reads=100, sweeps=1000):
    rng = np.random.default_rng(0)
    Q = random_qubo_batch(rng, B, n)
    rp = np.asarray(sa_sample_batch_pallas(jax.random.key(7), Q, reads, sweeps))
    rx = np.asarray(sa_sample_batch(jax.random.key(7), Q, reads, sweeps))
    ep, ex, dd = [], [], []
    for b in range(B):
        _, cold = default_beta_range(Q[b])
        _, _, marg, _ = exact_boltzmann(Q[b], beta=float(cold))
        m = np.asarray(marg)
        ep.append(float(np.abs(rp[b].mean(axis=0) - m).max()))
        ex.append(float(np.abs(rx[b].mean(axis=0) - m).max()))
        dd.append(float(np.abs(rp[b].mean(axis=0) - rx[b].mean(axis=0)).max()))
    print(f"pallas vs oracle: mean {np.mean(ep):.4f} max {np.max(ep):.3f}")
    print(f"xla    vs oracle: mean {np.mean(ex):.4f} max {np.max(ex):.3f}")
    print(f"pallas vs xla   : mean {np.mean(dd):.4f} max {np.max(dd):.3f}")
    assert np.mean(dd) < 0.05, "Pallas kernel diverges from the XLA sampler"
    print("STATISTICS OK")


def bench(shapes=((60, 6), (60, 41)), reads=100, sweeps=1000):
    rng = np.random.default_rng(1)

    def run_many(fn, Q, reps, base):
        acc = jnp.float32(0)
        for i in range(reps):
            acc = acc + fn(jax.random.key(base + i), Q, reads, sweeps).sum()
        return float(acc)  # one scalar fetch drains the queue

    for B, n in shapes:
        Q = random_qubo_batch(rng, B, n)
        line = f"B={B} n={n} reads={reads} sweeps={sweeps}:"
        for name, fn in (("pallas", sa_sample_batch_pallas), ("xla", sa_sample_batch)):
            run_many(fn, Q, 1, 0)
            t0 = time.perf_counter()
            run_many(fn, Q, 1, 50)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_many(fn, Q, 51, 100)
            t51 = time.perf_counter() - t0
            line += f"  {name} {(t51 - t1) / 50 * 1000:.1f} ms/call"
        print(line)


def validate_heatbath(B=30, n=6, reads=512, warmup=64):
    """BMS rule vs the exact Boltzmann distribution at the target beta."""
    rng = np.random.default_rng(2)
    Q = random_qubo_batch(rng, B, n)
    s = np.asarray(gibbs_sample_batch_pallas(jax.random.key(3), Q, reads, warmup, beta=1.0))
    gaps = []
    for b in range(B):
        _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
        gaps.append(float(np.abs(s[b].mean(axis=0) - np.asarray(marg)).max()))
    print(f"heatbath pallas vs oracle@beta1: mean {np.mean(gaps):.4f} max {np.max(gaps):.3f}")
    assert np.mean(gaps) < 0.05, "heat-bath kernel diverges from the oracle"
    print("HEATBATH STATISTICS OK")


def validate_pt(B=8, n=6, reads=512, sweeps=48, M=8):
    rng = np.random.default_rng(3)
    Q = random_qubo_batch(rng, B, n, scale=1.5)
    s = np.asarray(pt_sample_batch_pallas(
        jax.random.key(4), Q, reads, sweeps, num_replicas=M, beta_target=1.0))
    gaps = []
    for b in range(B):
        _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
        gaps.append(float(np.abs(s[b].mean(axis=0) - np.asarray(marg)).max()))
    print(f"pt pallas vs oracle@beta1: mean {np.mean(gaps):.4f} max {np.max(gaps):.3f}")
    assert np.mean(gaps) < 0.06, "PT kernel diverges from the oracle"
    print("PT STATISTICS OK")


def bench_bms_pt(shapes=((120, 3), (40, 7)), reads=1000, sweeps=1000):
    """Latency of the BMS/PT kernels vs their XLA fallbacks at the
    breastmnist sweep shapes (h2: clamped n=2 / unclamped n=3; h5: n=7)."""
    rng = np.random.default_rng(5)

    def run_many(fn, reps, base):
        acc = jnp.float32(0)
        for i in range(reps):
            acc = acc + fn(jax.random.key(base + i)).sum()
        return float(acc)

    for B, n in shapes:
        Q = random_qubo_batch(rng, B, n)
        pairs = (
            ("bms-pallas", lambda k: gibbs_sample_batch_pallas(k, Q, reads, sweeps, beta=1.0)),
            ("bms-xla", lambda k: gibbs_sample_batch(k, Q, reads, sweeps, beta=1.0)),
            ("pt-pallas", lambda k: pt_sample_batch_pallas(k, Q, reads, 64, num_replicas=8, beta_target=1.0)),
            ("pt-xla", lambda k: pt_sample_batch(k, Q, reads, 64, num_replicas=8, beta_target=1.0)),
        )
        line = f"B={B} n={n} reads={reads}:"
        for name, fn in pairs:
            run_many(fn, 1, 0)
            t0 = time.perf_counter()
            run_many(fn, 11, 100)
            dt = (time.perf_counter() - t0) / 11 * 1000
            line += f"  {name} {dt:.1f} ms"
        print(line)


def validate_lane(G=2, B=8, n=6, reads=1024, warmup=64):
    """Lane-stacked shared-coupling kernel (both rules, pair on/off) vs the
    exact oracle on its on-chip PRNG path (CI covers the update math via
    host variates; this is the hardware statistics check, like the packed
    kernels above).  scripts/probe_lane_kernel.py is the latency A/B."""
    from qbmx.samplers.api import densify_groups
    from qbmx.samplers.sa_lane import lane_sample_groups

    rng = np.random.default_rng(9)
    Qg = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    Qd = np.asarray(densify_groups(Qg, h)).reshape(G, B, n, n)
    for pair in (False, True):
        s = lane_sample_groups(jax.random.key(5), Qg, h, reads, warmup,
                               rule="heatbath", pair=pair,
                               beta_cold=jnp.full((G, B), 1.0))
        gaps = []
        for g in range(G):
            for b in range(B):
                m = np.asarray(exact_boltzmann(jnp.asarray(Qd[g, b]), beta=1.0)[2])
                gaps.append(np.abs(np.asarray(s[g, b]).mean(axis=0) - m).mean())
        print(f"lane heatbath pair={pair}: mean |marginal gap| "
              f"{float(np.mean(gaps)):.4f} (bar 0.03)")
        assert float(np.mean(gaps)) < 0.03


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", "run on TPU hardware"
    validate()
    validate_heatbath()
    validate_pt()
    validate_lane()
    bench()
    bench_bms_pt()
