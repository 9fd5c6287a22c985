"""Measure the SA-kernel routing alternatives at a given shape (real TPU).

The routing rules in ``qbmx.samplers.sa_pallas.pack_geometry`` and the
XLA-vs-Pallas crossover in ``qbmx.samplers.api.SASampler._pallas_enabled``
are all MEASURED, not derived; this is the instrument.  For each shape it
times the kernel under every viable forced pack size P next to the XLA
sampler, using queued bursts drained by a single scalar fetch (plain
``block_until_ready`` does not flush the axon tunnel — CLAUDE.md).

    python scripts/probe_pack_routing.py [B n R sweeps] ...

Defaults reproduce the round-2 routing decisions (v5e, 2026-08):

    B=1200 n=6 R=1000 S=1000: pallas ~60-67ms | xla 237.7ms
    B=1200 n=6 R=128  S=1000: pallas ~71ms    | xla  49.3ms
    B=600  n=41 R=100 S=100 : pallas ~42ms    | xla  19.2ms

and the multi-pack scoped-VMEM constraint: forcing P=64 at n=41 with
B > P (N=3072, G>1) is a deterministic compile-time OOM ("Scoped
allocation ... exceeded scoped vmem limit"), as is any multi-pack
geometry whose doubled blocks pass 16 MiB (observed again at N=1536 in
a jitted predict).  pack_geometry encodes both limits.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import qbmx.samplers.sa_pallas as sp
from qbmx.samplers.sa_jax import sa_sample_batch
from qbmx.core.qubo import random_qubo_batch

DEFAULT_SHAPES = [(1200, 6, 1000, 1000), (1200, 6, 128, 1000), (600, 41, 100, 100)]


def timed(fn, Q, reads, sweeps, reps=10):
    # CRITICAL: clear the jit cache first — sa_sample_batch_pallas is
    # jitted, so after monkeypatching pack_geometry an un-cleared call
    # with the same shapes is a cache HIT and silently times the PREVIOUS
    # geometry's kernel (this bug shipped in the first version of this
    # probe; every forced-P column measured the first-compiled P).
    clear = getattr(fn, "clear_cache", None)
    if clear is not None:
        clear()

    def run_many(n_reps, base):
        acc = jnp.float32(0)
        for i in range(n_reps):
            acc = acc + fn(jax.random.key(base + i), Q, reads, sweeps).sum()
        return float(acc)  # one scalar fetch drains the queue

    run_many(1, 0)  # compile
    t0 = time.perf_counter(); run_many(1, 50); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_many(reps + 1, 100); tn = time.perf_counter() - t0
    return (tn - t1) / reps


def forced(P):
    def pg(n, batch=None, reads=None):
        stride = sp._round_up(n + 1, 8)
        return stride, P, sp._round_up(stride * P, 128)

    return pg


def main(shapes):
    orig_pack = sp.pack_geometry
    rng = np.random.default_rng(3)
    for B, n, R, S in shapes:
        Q = random_qubo_batch(rng, B, n)
        st, P0, _ = orig_pack(n, batch=B, reads=R)
        line = f"B={B} n={n} R={R} S={S}:"
        sp.pack_geometry = orig_pack
        line += f" routed(P={P0}) {timed(sp.sa_sample_batch_pallas, Q, R, S) * 1e3:.1f}ms"
        for P in (8, 16, 32, 64, 128):
            if P == P0:
                continue
            N = sp._round_up(st * P, 128)
            # skip shapes that cannot fit even single-buffered
            if 4 * (N * N + 2 * N * sp._round_up(R, 128)) > 100 * 2**20:
                continue
            sp.pack_geometry = forced(P)
            try:
                line += f" P={P} {timed(sp.sa_sample_batch_pallas, Q, R, S) * 1e3:.1f}ms"
            except Exception as e:  # compile OOM etc. — part of the data
                line += f" P={P} FAIL({type(e).__name__})"
        sp.pack_geometry = orig_pack
        line += f" | xla {timed(sa_sample_batch, Q, R, S) * 1e3:.1f}ms"
        print(line, flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    shapes = [tuple(args[i : i + 4]) for i in range(0, len(args), 4)] or DEFAULT_SHAPES
    main(shapes)
