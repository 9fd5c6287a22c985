"""Hardware tier: on-chip validation of the Pallas PRNG paths.

Run with ``QBMX_TPU_TESTS=1 python -m pytest tests/ -m tpu -q`` on a real
TPU (the kernels' ``pltpu.prng_random_bits`` has no interpreter support, so
the CPU tier can only cover the update math via host variates).  These are
the oracle/statistics checks that previously lived only in
``scripts/validate_pallas_tpu.py`` (VERDICT r2 #7): a silent Mosaic
miscompile of the PRNG path — one already happened, see PERFORMANCE.md —
now fails `pytest -m tpu` instead of relying on script discipline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _oracle_marginals(Q, beta):
    from qbmx.samplers.exact import exact_boltzmann

    _, _, marg, _ = exact_boltzmann(Q, beta=beta)
    return np.asarray(marg)


def test_on_tpu():
    assert jax.devices()[0].platform == "tpu"


def test_sa_kernel_marginals_match_oracle():
    """Packed Metropolis kernel vs exact Boltzmann at the cold beta, and vs
    the XLA sampler (the scripts/validate_pallas_tpu.py bar: mean gap to
    the XLA sampler < 0.05 over random 6-var problems)."""
    from qbmx.core.qubo import default_beta_range, random_qubo_batch
    from qbmx.samplers.sa_jax import sa_sample_batch
    from qbmx.samplers.sa_pallas import sa_sample_batch_pallas

    rng = np.random.default_rng(0)
    B, n, reads, sweeps = 30, 6, 200, 500
    Q = random_qubo_batch(rng, B, n)
    rp = np.asarray(sa_sample_batch_pallas(jax.random.key(7), Q, reads, sweeps))
    rx = np.asarray(sa_sample_batch(jax.random.key(7), Q, reads, sweeps))
    gaps_p, gaps_d = [], []
    for b in range(B):
        _, cold = default_beta_range(Q[b])
        m = _oracle_marginals(Q[b], float(cold))
        gaps_p.append(float(np.abs(rp[b].mean(axis=0) - m).max()))
        gaps_d.append(float(np.abs(rp[b].mean(axis=0) - rx[b].mean(axis=0)).max()))
    assert np.mean(gaps_d) < 0.05, (np.mean(gaps_d), np.mean(gaps_p))


def test_heatbath_kernel_marginals_match_oracle():
    """Packed heat-bath (BMS) kernel: annealed to beta=1, the sample
    marginals and pair statistics must track the exact distribution — the
    same bar tests/test_samplers.py:167 sets for the XLA gibbs path."""
    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

    rng = np.random.default_rng(1)
    n, reads, warmup = 6, 2048, 64
    Q = jnp.asarray(
        np.stack([np.triu(rng.uniform(-1, 1, (n, n))) for _ in range(8)]),
        jnp.float32)
    s = np.asarray(gibbs_sample_batch_pallas(
        jax.random.key(5), Q, reads, warmup, beta=1.0))
    for b in range(Q.shape[0]):
        _, _, marg, pair = exact_boltzmann(Q[b], beta=1.0)
        assert np.allclose(s[b].mean(axis=0), np.asarray(marg), atol=0.05), b
        emp_pair = np.einsum("mi,mj->ij", s[b], s[b]) / reads
        assert np.allclose(emp_pair, np.asarray(pair), atol=0.07), b


def test_pt_kernel_marginals_match_oracle():
    """Packed PT kernel: the target rung samples the beta=1 Boltzmann
    distribution (same bar as tests/test_samplers.py TestParallelTempering)."""
    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import pt_sample_batch_pallas

    rng = np.random.default_rng(2)
    n, reads, sweeps, M = 6, 1024, 48, 8
    Q = jnp.asarray(
        np.stack([np.triu(rng.uniform(-1.5, 1.5, (n, n))) for _ in range(4)]),
        jnp.float32)
    s = np.asarray(pt_sample_batch_pallas(
        jax.random.key(3), Q, reads, sweeps, num_replicas=M, beta_target=1.0))
    for b in range(Q.shape[0]):
        _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
        assert np.allclose(s[b].mean(axis=0), np.asarray(marg), atol=0.06), b


def test_pt_kernel_bimodal_landscape():
    """PT's raison d'être: on the frustrated two-clique landscape the cold
    rung must track the exact marginals (one-way annealing tends to freeze
    into a single mode)."""
    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import pt_sample_batch_pallas

    n = 8
    Q = np.zeros((n, n), dtype="float32")
    for i in range(4):
        for j in range(i + 1, 4):
            Q[i, j] = -3.0
            Q[i + 4, j + 4] = -3.0
    Q[np.arange(4), np.arange(4)] = 4.4
    Q[np.arange(4, 8), np.arange(4, 8)] = 4.6
    Qb = jnp.asarray(Q)[None]
    _, _, marg, _ = exact_boltzmann(Qb[0], beta=1.0)
    s = np.asarray(pt_sample_batch_pallas(
        jax.random.key(1), Qb, 512, 64, num_replicas=8, beta_target=1.0))[0]
    assert np.abs(s.mean(axis=0) - np.asarray(marg)).max() < 0.1


def test_pair_gibbs_kernel_marginals_match_oracle():
    """Pair-update heat-bath kernel (two-variable joint conditionals) on
    hardware: same oracle bar as the single-variable rule."""
    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

    rng = np.random.default_rng(6)
    n, reads, warmup = 6, 2048, 64
    Q = jnp.asarray(
        np.stack([np.triu(rng.uniform(-1, 1, (n, n))) for _ in range(4)]),
        jnp.float32)
    s = np.asarray(gibbs_sample_batch_pallas(
        jax.random.key(2), Q, reads, warmup, beta=1.0, pair=True))
    for b in range(Q.shape[0]):
        _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
        assert np.allclose(s[b].mean(axis=0), np.asarray(marg), atol=0.05), b


def test_quad_gibbs_kernel_marginals_match_oracle():
    """Quad-update heat-bath kernel (four-variable joint conditionals, the
    16-state categorical + int bit-extraction path) on hardware: same
    oracle bar.  n=6 exercises a quad + remainder pair; n=9 adds the
    trailing single."""
    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

    rng = np.random.default_rng(6)
    reads, warmup = 2048, 64
    for n in (6, 9):
        Q = jnp.asarray(
            np.stack([np.triu(rng.uniform(-1, 1, (n, n))) for _ in range(4)]),
            jnp.float32)
        s = np.asarray(gibbs_sample_batch_pallas(
            jax.random.key(2), Q, reads, warmup, beta=1.0, quad=True))
        for b in range(Q.shape[0]):
            _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
            assert np.allclose(s[b].mean(axis=0), np.asarray(marg),
                               atol=0.05), (n, b)


def test_mosaic_roll_matches_host():
    """The PT exchange step leans on jnp.roll lowering correctly inside the
    kernel (sublane circular shift).  Pin the Mosaic lowering against the
    host semantics on an identifiable pattern."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, up_ref, dn_ref):
        up_ref[...] = jnp.roll(x_ref[...], -1, axis=0)
        dn_ref[...] = jnp.roll(x_ref[...], 1, axis=0)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    up, dn = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(x)
    np.testing.assert_array_equal(np.asarray(up), np.roll(np.asarray(x), -1, 0))
    np.testing.assert_array_equal(np.asarray(dn), np.roll(np.asarray(x), 1, 0))


def test_debug_and_prng_gibbs_agree_statistically():
    """The hardware PRNG heat-bath path and the host-variates debug path
    must agree in distribution (locks the PRNG wiring itself, not just the
    update math the CPU tier covers)."""
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

    rng = np.random.default_rng(4)
    n, reads, warmup = 6, 1024, 32
    Q = jnp.asarray(np.triu(rng.uniform(-1, 1, (1, n, n))), jnp.float32)
    s_hw = np.asarray(gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, warmup, beta=1.0))[0]
    init01 = jnp.asarray((rng.uniform(0, 1, (1, reads, n)) < 0.5).astype("float32"))
    uniforms = jnp.asarray(rng.uniform(0, 1, (warmup, 1, n, reads)).astype("float32"))
    s_dbg = np.asarray(gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, warmup, beta=1.0,
        debug_randoms=(init01, uniforms)))[0]
    assert np.abs(s_hw.mean(axis=0) - s_dbg.mean(axis=0)).max() < 0.06


def test_lane_kernel_marginals_match_oracle():
    """Lane-stacked shared-J kernel (both rules) vs exact Boltzmann at the
    target beta on its on-chip PRNG path."""
    from qbmx.core.qubo import random_qubo_batch
    from qbmx.samplers.api import densify_groups
    from qbmx.samplers.sa_lane import lane_sample_groups

    rng = np.random.default_rng(3)
    G, B, n, reads, warm = 2, 6, 6, 2048, 64
    Qg = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    Qd = np.asarray(densify_groups(Qg, h)).reshape(G, B, n, n)
    s = lane_sample_groups(jax.random.key(5), Qg, h, reads, warm,
                           rule="heatbath",
                           beta_cold=jnp.full((G, B), 1.0))
    gaps = []
    for g in range(G):
        for b in range(B):
            m = _oracle_marginals(jnp.asarray(Qd[g, b]), 1.0)
            gaps.append(float(np.abs(np.asarray(s[g, b]).mean(axis=0) - m).mean()))
    assert float(np.mean(gaps)) < 0.03, gaps


@pytest.mark.parametrize("pair", [False, True])
def test_lane_kernel_small_folds_on_chip(pair):
    """fold < 8 (large-n routing) on real hardware, single and pair
    updates (pair ships by DEFAULT on the heat-bath lane route, including
    fold<8 shapes like the n=717 CDQBM one): same statistics."""
    import qbmx.samplers.sa_lane as sl
    from qbmx.core.qubo import random_qubo_batch
    from qbmx.samplers.api import densify_groups
    from qbmx.samplers.sa_lane import lane_sample_groups

    rng = np.random.default_rng(4)
    B, n, reads, warm = 6, 9, 2048, 64
    Qg = random_qubo_batch(rng, 1, n)
    h = jnp.asarray(rng.normal(size=(1, B, n)).astype(np.float32))
    Qd = np.asarray(densify_groups(Qg, h)).reshape(B, n, n)
    orig = sl.lane_geometry
    try:
        for fold in (1, 2, 4):
            def forced(n_, P_, R_, groups=1, fold=fold):
                n_pad = ((n_ + 7) // 8) * 8
                L = P_ * R_
                q = 128 * fold
                Lc = min(((L + q - 1) // q) * q, 2048 * fold)
                return n_pad, Lc, -(-L // Lc), fold

            sl.lane_geometry = forced
            lane_sample_groups.clear_cache()
            s = lane_sample_groups(jax.random.key(5), Qg, h, reads, warm,
                                   rule="heatbath", pair=pair,
                                   beta_cold=jnp.full((1, B), 1.0))[0]
            gaps = [
                float(np.abs(np.asarray(s[b]).mean(axis=0)
                             - _oracle_marginals(jnp.asarray(Qd[b]), 1.0)).mean())
                for b in range(B)
            ]
            assert float(np.mean(gaps)) < 0.03, (fold, gaps)
    finally:
        sl.lane_geometry = orig
        lane_sample_groups.clear_cache()


def test_packed_per_pack_streams_reproduce_on_chip():
    """r5 (VERDICT r4 Weak #4): the packed kernel's on-chip stream for pack
    g depends only on that pack's problems' keys — swap the second pack's
    keys and the first pack's samples must be BIT-identical while the
    second pack's change.  n=6 B=32 R=64 → P=16, two packs."""
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas, pack_geometry

    rng = np.random.default_rng(13)
    B, n, reads, warm = 32, 6, 64, 16
    _, P, _ = pack_geometry(n, batch=B, reads=reads)
    assert P == 16 and B // P == 2
    Q = jnp.asarray(
        np.stack([np.triu(rng.uniform(-1, 1, (n, n))) for _ in range(B)]),
        jnp.float32)
    keys = jax.random.split(jax.random.key(0), B)
    keys2 = keys.at[P:].set(jax.random.split(jax.random.key(88), B - P))
    s1 = np.asarray(gibbs_sample_batch_pallas(keys, Q, reads, warm, beta=1.0))
    s2 = np.asarray(gibbs_sample_batch_pallas(keys2, Q, reads, warm, beta=1.0))
    np.testing.assert_array_equal(s1[:P], s2[:P])
    assert not np.array_equal(s1[P:], s2[P:])


def test_lane_per_group_streams_reproduce_on_chip():
    """r5 (VERDICT r4 Weak #4): the lane kernel's on-chip stream for group
    g is a function of group g's keys alone — swap group 1's keys and
    group 0's samples must be BIT-identical while group 1's change.  This
    is the property the seed-parallel sweeps' per-seed reproducibility
    rides on for their lane-route (TPU) runs."""
    from qbmx.core.qubo import random_qubo_batch
    from qbmx.samplers.sa_lane import lane_sample_groups

    rng = np.random.default_rng(12)
    G, B, n, reads, warm = 2, 4, 8, 64, 16
    Qg = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), G * B).reshape(G, B)
    keys2 = keys.at[1].set(jax.random.split(jax.random.key(99), B))
    kw = dict(rule="heatbath", beta_cold=jnp.full((G, B), 1.0))
    s1 = np.asarray(lane_sample_groups(keys, Qg, h, reads, warm, **kw))
    s2 = np.asarray(lane_sample_groups(keys2, Qg, h, reads, warm, **kw))
    np.testing.assert_array_equal(s1[0], s2[0])
    assert not np.array_equal(s1[1], s2[1])


@pytest.mark.parametrize("rule", ["metropolis", "heatbath"])
def test_lane_kernel_natural_fold4_large_n_compiles(rule):
    """r5 regression: at n=149 (the --n_kernels 4 CDQBM shape) the natural
    geometry picks fold=4, whose single-update sub-step row slabs are NOT
    provably 8-aligned — the unfixed kernel failed Mosaic compile on
    hardware ('index in dimension 2 is a multiple of 8',
    memref<1x1x608x768>).  No forced geometry here: this pins the route the
    models actually take.  Polarized diagonal makes the cold-beta answer
    checkable without an oracle."""
    from qbmx.samplers.sa_lane import lane_geometry, lane_sample_groups

    n, B, reads, sweeps = 149, 2, 16, 60
    n_pad, Lc, C, fold = lane_geometry(n, B, reads)
    assert fold < 8 and Lc > 0, (n_pad, Lc, C, fold)
    diag = np.zeros(n, dtype=np.float32)
    diag[:10] = -5.0
    diag[10:] = 5.0
    Qg = jnp.asarray(np.diag(diag))[None]
    h = jnp.zeros((1, B, n), jnp.float32)
    s = np.asarray(lane_sample_groups(
        jax.random.key(11), Qg, h, reads, sweeps, rule=rule,
        beta_cold=jnp.full((1, B), 3.0))[0])
    assert set(np.unique(s)) <= {0.0, 1.0}
    m = s.mean(axis=(0, 1))
    assert m[:10].min() > 0.9 and m[10:].max() < 0.1, (rule, m[:12])


def test_lane_kernel_under_shard_map_on_chip():
    """VERDICT r3 Weak #4: the lane kernel must COMPILE (real Mosaic, not
    interpret) and run inside jit(shard_map) on a device mesh — the
    combination the multi-chip training path uses.  1-device (dp, chains)
    mesh; oracle bar identical to the unsharded lane test."""
    from jax.sharding import Mesh, PartitionSpec as P

    from qbmx.core.qubo import random_qubo_batch
    from qbmx.samplers.api import densify_groups
    from qbmx.samplers.sa_lane import lane_sample_groups

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "chains"))
    rng = np.random.default_rng(8)
    G, B, n, reads, warm = 2, 6, 6, 2048, 64
    Qg = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    Qd = np.asarray(densify_groups(Qg, h)).reshape(G, B, n, n)

    def local(Qs, he, key):
        return lane_sample_groups(key, Qs, he, reads, warm, rule="heatbath",
                                  beta_cold=jnp.full((G, B), 1.0))

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P(), P(), P()),
                               out_specs=P(), check_vma=False))
    s = np.asarray(fn(Qg, h, jax.random.key(4)))
    gaps = [
        float(np.abs(s[g, b].mean(axis=0)
                     - _oracle_marginals(jnp.asarray(Qd[g, b]), 1.0)).mean())
        for g in range(G) for b in range(B)
    ]
    assert float(np.mean(gaps)) < 0.03, gaps


def test_packed_kernel_under_shard_map_on_chip():
    """The packed kernel under jit(shard_map): the dense-fallback route
    mesh-sharded steps take at many-reads shapes."""
    from jax.sharding import Mesh, PartitionSpec as P

    from qbmx.samplers.exact import exact_boltzmann
    from qbmx.samplers.sa_pallas import gibbs_sample_batch_pallas

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "chains"))
    rng = np.random.default_rng(9)
    n, reads, warmup = 6, 2048, 64
    Q = jnp.asarray(
        np.stack([np.triu(rng.uniform(-1, 1, (n, n))) for _ in range(4)]),
        jnp.float32)

    def local(Qb, key):
        return gibbs_sample_batch_pallas(key, Qb, reads, warmup, beta=1.0)

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P(), P()),
                               out_specs=P(), check_vma=False))
    s = np.asarray(fn(Q, jax.random.key(6)))
    for b in range(Q.shape[0]):
        _, _, marg, _ = exact_boltzmann(Q[b], beta=1.0)
        assert np.allclose(s[b].mean(axis=0), np.asarray(marg), atol=0.05), b


def test_sharded_training_step_routes_on_chip():
    """Full mesh-sharded DQBM training steps on a 1-device mesh, one config
    per route: the structured lane route (few reads) and the densify→packed
    fallback (many reads).  Both must compile and run EAGERLY (not scanned),
    and the epoch-scan decision must match each route's scan-safety
    (VERDICT r3 Weak #1: decision == actual per-shard route)."""
    from qbmx.models.dqbm import DiscQBM
    from qbmx.parallel.mesh import make_mesh, shard_model
    from qbmx.samplers.api import SASampler, _lane_preferred

    mesh = make_mesh(dp=1, chains=1)
    rng = np.random.default_rng(10)
    for H, B, reads, expect_scan in [(41, 60, 100, True), (8, 8, 1000, False)]:
        model = DiscQBM(dim_input=4, n_hidden_nodes=H, seed=0,
                        sample_count=reads, restricted=False,
                        sampler=SASampler(num_sweeps=20))
        shard_model(model, mesh)
        n = model._qubo_n()
        assert _lane_preferred(n, B, reads, 2) == expect_scan
        assert model.supports_epoch_scan(B) == expect_scan, (H, B, reads)
        x = jnp.asarray(rng.uniform(0, 1, (B, 4)), dtype=jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, B), dtype=jnp.float32)
        mask = jnp.ones((B,), dtype=jnp.float32)
        new_p, nll, _ = model._step(model.params, x, y, mask, 0.1,
                                    jax.random.key(1))
        jax.block_until_ready(new_p)
        assert np.isfinite(float(nll)), (H, B, reads)


def test_lane_kernel_sa_rule_marginals_match_oracle():
    """Lane kernel, METROPOLIS rule (the SA sample_groups route models use
    for training at few-reads shapes) vs exact Boltzmann at the cold beta
    on its on-chip PRNG path — same bar as the packed SA test above."""
    from qbmx.core.qubo import default_beta_range, random_qubo_batch
    from qbmx.samplers.api import densify_groups
    from qbmx.samplers.sa_lane import lane_sample_groups

    rng = np.random.default_rng(6)
    G, B, n, reads, sweeps = 2, 6, 6, 512, 500
    Qg = random_qubo_batch(rng, G, n)
    h = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    Qd = np.asarray(densify_groups(Qg, h)).reshape(G, B, n, n)
    s = lane_sample_groups(jax.random.key(9), Qg, h, reads, sweeps,
                           rule="metropolis")
    gaps = []
    for g in range(G):
        for b in range(B):
            _, cold = default_beta_range(jnp.asarray(Qd[g, b]))
            m = _oracle_marginals(jnp.asarray(Qd[g, b]), float(cold))
            gaps.append(float(np.abs(np.asarray(s[g, b]).mean(axis=0) - m).max()))
    # annealed-to-cold marginals concentrate near the ground state; allow
    # the same spread the packed SA test allows
    assert float(np.mean(gaps)) < 0.08, gaps
