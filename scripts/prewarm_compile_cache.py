"""Pre-warm the persistent XLA compile cache for the standard CLI shapes.

The remote AOT compile service is the dominant first-call cost on the axon
TPU (tens of seconds per unique program, occasionally minutes — CLAUDE.md);
the persistent cache (``QBMX_COMPILE_CACHE``, wired in ``qbmx.cli._common``)
amortizes compiles across processes, but somebody still pays the first one.
This script pays it up front by running each standard configuration for ONE
epoch: the jitted programs (whole-epoch launch, fused train step, batched
prediction) are shape-specialized, and every later epoch/seed of the same
configuration reuses them, so a 10-seed × 20-epoch sweep started afterwards
is compile-free.

Presets mirror the parity-sweep configurations (PARITY.md):
  qbm_breast   — flat Disc_QBM, breastmnist, H=5, sc=1000, bs=60, rFalse
  cdqbm_mnist  — modular CDQBM, mnist, 3x3 kernel, anneal=1000, 16 batches
  rbm_breast   — discriminative RBM, breastmnist, H=9, bs=7
  qbm_sweep_seedparallel — the 10-seed seed-parallel sweep's programs
                           (one epoch, in-process)

Usage:  python scripts/prewarm_compile_cache.py [preset ...]
        (no args = all presets)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def qbm_breast():
    from qbmx.cli.qbm_main import main

    # restricted=False: the 10-seed parity sweep runs rFalse (its traced
    # program differs entirely from the restricted one — linear-shortcut
    # branch, w_hh zeroing — so warming the wrong flag warms nothing)
    main(seed=0, n_hidden_nodes=5, solver="SA", sample_count=1000, anneal=1000,
         beta_eff=1.0, epochs=1, batch_size=60, learning_rate=0.307,
         restricted=False, data_set="breastmnist", save="")


def cdqbm_mnist():
    from qbmx.cli.cdqbm_main import main

    # anneal (num_sweeps) is a STATIC jit arg of the samplers — warm the
    # CLI default 1000, not a cheaper stand-in.  samples_per_class=100:
    # this environment lacks the MNIST train blob, so load_dataset takes
    # the t10k 80/10/10 fallback → 0.8·200 = 160 train imgs → exactly one
    # 16-batch epoch segment (EPOCH_UNROLL_SEGMENT), the hot program of
    # every larger run (ragged tail segments still compile on first use;
    # tails are not presettable).
    main(seed=0, data_set="mnist", epochs=1, batch_size=10, sample_count=100,
         anneal=1000, learning_rate=0.05, kernel_size=3, pooling_size=2,
         pooling_type="deterministic", samples_per_class=100, save="")


def rbm_breast():
    from qbmx.cli.rbm_main import build_parser, main

    with tempfile.TemporaryDirectory() as td:
        main(build_parser().parse_args(
            ["--epochs", "1", "--seeds", "0", "--out", td]))


def qbm_sweep_seedparallel():
    # the 10-seed seed-PARALLEL breastmnist sweep's programs (epoch segment
    # + batched predict over the stacked seed axis) — one epoch compiles
    # every shape the full 20-epoch sweep reuses.  Runs IN-PROCESS (runpy):
    # a subprocess would be a second live TPU client next to the presets
    # that already initialized the TPU here — concurrent TPU processes
    # deadlock silently (CLAUDE.md).
    import runpy

    argv, sys.argv = sys.argv, ["qbm_seed_parallel_sweep.py", "--epochs", "1"]
    try:
        runpy.run_path(
            str(Path(__file__).resolve().parent / "qbm_seed_parallel_sweep.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv


PRESETS = {"qbm_breast": qbm_breast, "cdqbm_mnist": cdqbm_mnist,
           "rbm_breast": rbm_breast,
           "qbm_sweep_seedparallel": qbm_sweep_seedparallel}


def main(argv):
    names = argv or list(PRESETS)
    unknown = [n for n in names if n not in PRESETS]
    if unknown:
        raise SystemExit(f"unknown preset(s) {unknown}; valid: {list(PRESETS)}")
    for name in names:
        t0 = time.time()
        print(f"--- prewarm {name} ---", flush=True)
        PRESETS[name]()
        print(f"--- {name} warmed in {time.time() - t0:.1f}s ---", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
