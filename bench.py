"""Driver-facing benchmark battery.

Emits one JSON line per metric; the HEADLINE metric (CD-1 RBM training
throughput on binarized MNIST, north star ≥100k images/sec/chip,
BASELINE.json) prints LAST so a last-line parser keeps recording it.
Extra rows (VERDICT r4 #3 — the driver benchmark must also see the
reference-shape model and the sampler core, SURVEY §6):

1. reference-shape RBM (H=9, the reference's ``rbm_main.py:14-20`` config)
   with an MFU estimate,
2. SA sampler spin-update throughput at the breastmnist training shape
   (B=60, n=6, 1000 reads × 1000 sweeps — ``sample_count``/``anneal_steps``
   of the BASELINE sweep row),
3. same at the CDQBM shape (B=60, n=41, 100 reads × 1000 sweeps).

``vs_baseline``: RBM rows divide by the 100k img/s north star; SA rows
divide by the reference's process-pool neal rate derived from its own
profile (``src/paper_plots/s20_vectorized_parallelized.prof``: 600
``get_samples`` calls = 19.89 s at sample_count=20, 1000 neal sweeps,
n≈6 → ≈3.6e6 spin-updates/sec).

Timing is device-resident: ONE dispatch burst + ONE scalar fetch per
measurement (the axon tunnel neither pipelines rapid dispatches nor
flushes on ``block_until_ready``, CLAUDE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

def _enable_compile_cache():
    """Persistent compile cache (the shared qbmx.cli._common setup — one
    copy of the knobs): the extra rows add shape families whose first
    remote-AOT compile can take minutes; the cache amortizes them across
    rounds."""
    from qbmx.cli._common import enable_compile_cache

    enable_compile_cache()

#: reference neal-pool spin-update rate (derivation in the module docstring)
REF_SA_SPIN_UPDATES_PER_SEC = 3.6e6
#: bf16 peak of a v5e chip (the BASELINE.json target hardware) for MFU
V5E_BF16_PEAK_FLOPS = 197e12


def load_images(n_target: int = 65536):
    from qbmx.data import loaders

    try:
        x, y = loaders.get_mnist(
            "t10k-images-idx3-ubyte.gz", "t10k-labels-idx1-ubyte.gz", classes=[0, 1]
        )
    except FileNotFoundError:
        x, y = loaders.synthetic_images(4096, shape=(28, 28), num_classes=2, seed=0)
    x = loaders.binarize(x.reshape(len(x), -1))
    y = np.asarray(y)
    reps = max(n_target // len(x), 1)
    x = np.tile(x, (reps, 1))[:n_target]
    y = np.tile(y, reps)[:n_target]
    return x, y


def measure_rbm(x, y, batch_size: int, num_hidden: int, reps: int = 200):
    """CD-1 RBM training images/sec at (batch, hidden); returns
    (imgs_per_sec, mfu_estimate)."""
    import jax
    import jax.numpy as jnp

    from qbmx.models.rbm import init_params, make_epoch_scan, make_train_step

    n = (len(x) // batch_size) * batch_size
    nb = n // batch_size
    # bf16 compute mode: binary states and stats matmuls at bf16 (params
    # and updates stay f32) — +22% on the bandwidth-bound path; accuracy
    # at this config verified unchanged by scripts/bench_accuracy.py
    xb = jnp.asarray(x[:n].reshape(nb, batch_size, -1), dtype=jnp.bfloat16)
    yb = jnp.asarray(y[:n].reshape(nb, batch_size), dtype=jnp.int32)

    step = make_train_step(num_classes=2, method="generative", cd_k=1,
                           compute_dtype=jnp.bfloat16)
    epoch = make_epoch_scan(step)
    params = init_params(jax.random.key(0), xb.shape[-1], num_hidden, 2)
    # rbg PRNG: XLA's RngBitGenerator instead of threefry — the Gibbs
    # bernoulli draws were VPU-bound under threefry (20.9 -> 37.6M imgs/s
    # measured on v5e at this config; unsafe_rbg measured slower at 51.8M
    # vs rbg 56.3M after the mean-field-CD change)
    key = jax.random.key(1, impl="rbg")

    @jax.jit
    def run_epochs(params, key):
        def body(carry, k):
            p, acc = carry
            p, loss = epoch(p, k, xb, yb, 0.05)
            return (p, acc + loss), None

        (p, acc), _ = jax.lax.scan(
            body, (params, jnp.float32(0)), jax.random.split(key, reps)
        )
        return p, acc

    _, acc = run_epochs(params, key)  # compile + warmup
    float(acc)
    estimates = []
    for trial in range(3):
        t0 = time.perf_counter()
        _, acc = run_epochs(params, jax.random.fold_in(key, trial))
        float(acc)
        estimates.append((time.perf_counter() - t0) / reps)
    per_epoch = sorted(estimates)[1]
    imgs_per_sec = n / per_epoch
    # CD-1 matmul FLOPs per image ≈ 10·V·H: hidden-prob of the data, the
    # mean-field recon pair (visible-prob + hidden-prob), and the two
    # (V,B)x(B,H) statistics products — 5 matmuls × 2VH each (class-weight
    # terms C·H and biases are <1% at C=2 and ignored)
    V, H = int(xb.shape[-1]), num_hidden
    mfu = imgs_per_sec * 10 * V * H / V5E_BF16_PEAK_FLOPS
    return imgs_per_sec, mfu


def emit_rbm_row(metric: str, imgs_per_sec: float, mfu: float):
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / 100_000.0, 3),
        "mfu_v5e_bf16": round(mfu, 4),
    }), flush=True)


def measure_sa(B: int, n: int, reads: int, sweeps: int, burst: int = 20):
    """Spin-update throughput of the routed SA sampler (the exact call
    training makes) at a (B, n, reads, sweeps) shape."""
    import jax
    import jax.numpy as jnp

    from qbmx.core.qubo import random_qubo_batch
    from qbmx.samplers.api import get_sampler

    rng = np.random.default_rng(1)
    Q = jnp.asarray(random_qubo_batch(rng, B, n))
    sampler = get_sampler("SA", num_sweeps=sweeps)

    def run_many(reps, base):
        acc = jnp.float32(0)
        for i in range(reps):
            acc = acc + sampler.sample_batch(jax.random.key(base + i), Q, reads).sum()
        return float(acc)  # one scalar fetch drains the tunnel queue

    run_many(1, 0)  # compile + warmup
    t0 = time.perf_counter()
    run_many(1, 50)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_many(burst + 1, 100)
    tburst = time.perf_counter() - t0
    per_call = (tburst - t1) / burst
    return B * reads * sweeps * n / per_call


def emit_sa_row(metric: str, spin_updates_per_sec: float):
    print(json.dumps({
        "metric": metric,
        "value": round(spin_updates_per_sec, 1),
        "unit": "spin_updates/sec",
        "vs_baseline": round(spin_updates_per_sec / REF_SA_SPIN_UPDATES_PER_SEC, 3),
    }), flush=True)


def main(batch_size: int = 4096, num_hidden: int = 128, headline_only: bool = False):
    # headline defaults are the measured-best config; num_hidden=128 is wide
    # enough to exercise the MXU (reference uses 9 — that row prints too)
    _enable_compile_cache()
    x, y = load_images()

    if not headline_only:
        ref_rate, ref_mfu = measure_rbm(x, y, batch_size, 9)
        emit_rbm_row("mnist_cd1_rbm_train_throughput_h9_reference_shape",
                     ref_rate, ref_mfu)
        emit_sa_row("sa_sampler_throughput_breastmnist_shape",
                    measure_sa(B=60, n=6, reads=1000, sweeps=1000))
        emit_sa_row("sa_sampler_throughput_cdqbm_shape",
                    measure_sa(B=60, n=41, reads=100, sweeps=1000))

    rate, mfu = measure_rbm(x, y, batch_size, num_hidden)
    emit_rbm_row("mnist_cd1_rbm_train_throughput", rate, mfu)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--headline_only", action="store_true",
                    help="skip the reference-shape and sampler rows")
    a = ap.parse_args()
    main(batch_size=a.batch, num_hidden=a.hidden, headline_only=a.headline_only)
