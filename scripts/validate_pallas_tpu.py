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
from qbmx.samplers.sa_jax import sa_sample_batch
from qbmx.samplers.sa_pallas import sa_sample_batch_pallas


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


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", "run on TPU hardware"
    validate()
    bench()
