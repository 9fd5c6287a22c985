"""Capture a JAX profiler trace of one training step per model family.

The tracing/observability counterpart of the reference's cProfile artifacts
(``src/paper_plots/*.prof``, SURVEY.md §5) — produces a TensorBoard-loadable
trace under --out for inspecting sampler kernels, fusion, and host gaps.

Usage: python scripts/profile_trace.py [--out /tmp/qbmx_trace]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/qbmx_trace")
    ap.add_argument("--batch", type=int, default=60)
    ap.add_argument("--reads", type=int, default=100)
    ap.add_argument("--sweeps", type=int, default=1000)
    args = ap.parse_args()

    from qbmx.models.dqbm import DiscQBM

    model = DiscQBM(dim_input=784, n_hidden_nodes=5, seed=0,
                    sample_count=args.reads, anneal_steps=args.sweeps)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (args.batch, 784)).astype("float32")
    y = rng.integers(0, 2, args.batch).astype("float32")

    _, nll = model.train_for_one_iteration(x, y, 0.1)  # compile outside the trace
    float(nll)  # drain the queue before opening the trace window
    with jax.profiler.trace(args.out):
        for _ in range(3):
            _, nll = model.train_for_one_iteration(x, y, 0.1)
        float(nll)  # steps are async; force execution inside the window
    print(f"trace written to {args.out} (open with TensorBoard or xprof)")


if __name__ == "__main__":
    main()
