"""Hardware A/B: single vs pair- vs quad-Gibbs heat-bath kernel (real TPU).

Pair updates (``GibbsSampler(pair_updates=True)``) halve the sequential
sub-step chain per sweep — each fused block resamples consecutive variable
PAIRS from their exact 4-state conditionals (``sa_pallas._sa_kernel``
pair branch; semantics CI-locked against ``gibbs._pair_heat_bath_sweep``).
Whether that halving shows up on the wall clock is a question about the
kernel's per-sub-step floor (grid programs run sequentially on the core —
CLAUDE.md), so it must be measured, not derived: this is the instrument
(VERDICT r2 #5 follow-up; ROADMAP r3 "hardware A/B ... still to be
measured").

Timing protocol per CLAUDE.md: queued bursts drained by ONE scalar fetch
(``block_until_ready`` does not flush the axon tunnel), warm-compile call
excluded, pair=True/False are distinct jit cache entries (static arg) so
no cache-clearing hazard.  Run EXCLUSIVELY — no other TPU process.

Shapes: the routed DQBM sweep shapes (n=6 = h5 production config,
n=9 = h8 search winner; fused sweep batch = seeds x batch_size x phases)
plus the CDQBM stack shape n=41.

    python scripts/probe_pair_gibbs.py            # default battery
    python scripts/probe_pair_gibbs.py B n R W    # one shape
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
from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

# (fused batch B, vars n, reads R, warmup sweeps W)
DEFAULT_SHAPES = [
    (120, 6, 1000, 64),    # h5 sweep, 10 seeds x bs12 equivalents
    (1200, 6, 1000, 64),   # h5 sweep, 10 seeds x bs60 x 2 phases
    (2160, 9, 1000, 64),   # h8 search winner: 30 seeds x bs36 x 2 phases
    (600, 41, 100, 64),    # CDQBM stack shape
]


def timed(mode: str, Q, reads, warmup, reps=10):
    pair, quad = mode == "pair", mode == "quad"

    def run_many(n_reps, base):
        acc = jnp.float32(0)
        for i in range(n_reps):
            acc = acc + gibbs_sample_batch_pallas(
                jax.random.key(base + i), Q, reads, warmup, 1.0,
                pair=pair, quad=quad).sum()
        return float(acc)  # one scalar fetch drains the queue

    run_many(1, 0)  # compile
    # size the burst so queued kernel time dominates the ~40ms RPC fetch
    # noise (sub-ms kernels at reps=10 measured NEGATIVE in r4 — the
    # 1-burst baseline's noise transfers through the subtraction)
    t0 = time.perf_counter(); run_many(8, 20); est = (time.perf_counter() - t0) / 8
    reps = max(reps, min(400, int(0.8 / max(est, 1e-5))))
    trials = []
    for tr in range(3):
        t0 = time.perf_counter(); run_many(1, 50 + 10 * tr)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run_many(reps + 1, 1000 + 100 * tr)
        tn = time.perf_counter() - t0
        trials.append((tn - t1) / reps)
    return float(np.median(trials))


def quality(mode: str, rng, reads=4096, warmup=64, n=6, B=8):
    """Mean |marginal - exact| at beta=1 — joint modes must match the
    single-variable chain's agreement with the oracle, not just be fast."""
    Q = random_qubo_batch(rng, B, n)
    s = gibbs_sample_batch_pallas(jax.random.key(7), Q, reads, warmup, 1.0,
                                  pair=mode == "pair", quad=mode == "quad")
    errs = []
    for b in range(B):
        marg = exact_boltzmann(Q[b], beta=1.0)[2]
        errs.append(np.abs(np.asarray(s[b]).mean(axis=0) - np.asarray(marg)).mean())
    return float(np.mean(errs))


def main(shapes):
    rng = np.random.default_rng(11)
    print(f"devices: {jax.devices()}")
    for B, n, R, W in shapes:
        Q = random_qubo_batch(rng, B, n)
        t1 = timed("single", Q, R, W)
        t2 = timed("pair", Q, R, W)
        t4 = timed("quad", Q, R, W)
        print(f"B={B:5d} n={n:2d} R={R:4d} W={W}:  "
              f"single {t1 * 1e3:7.1f} ms | pair {t2 * 1e3:7.1f} ms | "
              f"quad {t4 * 1e3:7.1f} ms | "
              f"pair {t1 / t2:4.2f}x | quad {t1 / t4:4.2f}x | "
              f"quad/pair {t2 / t4:4.2f}x", flush=True)
    q1 = quality("single", rng)
    q2 = quality("pair", rng)
    q4 = quality("quad", rng)
    print(f"oracle agreement (mean |marg err|, n=6 beta=1): "
          f"single {q1:.4f} | pair {q2:.4f} | quad {q4:.4f}")


if __name__ == "__main__":
    if len(sys.argv) == 5:
        main([tuple(int(a) for a in sys.argv[1:])])
    else:
        main(DEFAULT_SHAPES)
