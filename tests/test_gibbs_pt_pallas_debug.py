"""CI coverage for the Pallas heat-bath (BMS) and parallel-tempering paths
via the debug (host-variates) route.

Same approach as tests/test_sa_pallas_debug.py (the Metropolis lock): with
``debug_randoms`` the init bits, per-sweep uniforms, and (for PT) swap
uniforms are inputs, so ``interpret=True`` runs under pytest on CPU and the
update math is locked against ``gibbs._heat_bath_sweep`` /
``tempering``-style reference trajectories given identical variates — the
role the reference's local ``BoltzmannSampler`` plays
(``src/model/faster_dqbm.py:622-653``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.core.qubo import default_beta_range, qubo_energies, split_qubo
from qbmx.samplers.exact import exact_boltzmann
from qbmx.samplers.gibbs import _heat_bath_sweep
from qbmx.samplers.sa_pallas import (
    gibbs_sample_batch_pallas,
    pt_sample_batch_pallas,
)


def _random_problem(rng, B, n, reads, sweeps):
    Q = np.triu(rng.uniform(-2, 2, (B, n, n)).astype(np.float32))
    init01 = (rng.uniform(0, 1, (B, reads, n)) < 0.5).astype(np.float32)
    uniforms = rng.uniform(0, 1, (sweeps, B, n, reads)).astype(np.float32)
    return jnp.asarray(Q), jnp.asarray(init01), jnp.asarray(uniforms)


def _gibbs_reference_trajectory(Q, init01, uniforms, num_warmup, beta):
    """The same anneal with gibbs' sweep function and the kernel's beta
    formula: beta_t = hot * exp(log(target/hot) * t/(S-1)), with
    hot = min(default_hot, target)."""
    B = Q.shape[0]
    hot0, _ = default_beta_range(Q)
    hot = jnp.minimum(hot0.astype(jnp.float32), jnp.float32(beta))
    if num_warmup == 1:
        hot = jnp.full_like(hot, beta)
    inv_span = np.float32(1.0 / max(num_warmup - 1, 1))
    out = []
    for b in range(B):
        h, J = split_qubo(Q[b])
        s = jnp.asarray(init01[b], jnp.float32)  # (R, n)
        logr = jnp.log(jnp.float32(beta) / hot[b])
        for t in range(num_warmup):
            frac = jnp.float32(t) * inv_span
            bt = hot[b] * jnp.exp(logr * frac)
            s = _heat_bath_sweep(s, jnp.asarray(uniforms[t, b], jnp.float32), bt, h, J)
        out.append(np.asarray(s))
    return np.stack(out)


@pytest.mark.parametrize(
    "n,B,reads,sweeps",
    [
        (5, 3, 16, 8),    # use_mask strategy (stride 8 ≤ 16), P=16
        (14, 2, 8, 6),    # use_mask, stride 16, P=8
        (20, 8, 8, 6),    # block-sweep, P=8 (aligned packs)
        (41, 1, 4, 4),    # block-sweep, the real CDQBM shape class
        (6, 2, 8, 1),     # single sweep runs at the target beta (edge)
    ],
)
def test_heatbath_trajectories_match_gibbs(n, B, reads, sweeps):
    rng = np.random.default_rng(n * 1000 + B + 7)
    Q, init01, uniforms = _random_problem(rng, B, n, reads, sweeps)

    got = gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, beta=1.0, interpret=True,
        debug_randoms=(init01, uniforms),
    )
    want = _gibbs_reference_trajectory(Q, init01, uniforms, sweeps, 1.0)
    assert got.shape == (B, reads, n)
    np.testing.assert_array_equal(np.asarray(got), want)


def _pt_reference_trajectory(Q, init01, uniforms, swap_u, M, num_sweeps,
                             beta_target):
    """Mirror of the kernel's PT semantics in plain JAX/numpy: per-rung
    heat-bath sweeps (kernel threshold form) + alternating-parity state
    swaps with dβ·dE < -log(u).  Energies recomputed exactly (the kernel
    tracks them incrementally; f32 paths agree on these seeds)."""
    B, n = Q.shape[0], Q.shape[-1]
    hot0, _ = default_beta_range(Q)
    bt = np.float32(beta_target)
    out = []
    for b in range(B):
        h, J = split_qubo(Q[b])
        bh = np.float32(min(float(hot0[b]), float(bt) * 0.5))
        t = np.arange(M, dtype=np.float32) / max(M - 1, 1)
        betas = np.exp(
            np.log(bh) + t * (np.log(bt) - np.log(bh))
        ).astype(np.float32)
        s = np.stack(
            [np.asarray(init01[b * M + m], np.float32) for m in range(M)]
        )  # (M, R, n)
        R = s.shape[1]
        for sw in range(num_sweeps):
            for m in range(M):
                s[m] = np.asarray(_heat_bath_sweep(
                    jnp.asarray(s[m]), jnp.asarray(uniforms[sw, b * M + m]),
                    jnp.float32(betas[m]), h, J,
                ))
            E = np.stack(
                [np.asarray(qubo_energies(Q[b], jnp.asarray(s[m]))) for m in range(M)]
            )  # (M, R)
            parity = sw % 2
            for m in range(M - 1):
                if m % 2 != parity:
                    continue
                d_beta = betas[m + 1] - betas[m]
                dE = E[m] - E[m + 1]
                usw = np.asarray(swap_u[sw, b * M + m])[:R]
                accept = d_beta * dE < -np.log(usw)
                hi = s[m][accept].copy()
                s[m][accept] = s[m + 1][accept]
                s[m + 1][accept] = hi
        out.append(s[M - 1])
    return np.stack(out)  # (B, R, n)


@pytest.mark.parametrize(
    "n,B,M,reads,sweeps",
    [
        (5, 2, 4, 8, 6),    # mask-geometry shape forced onto the block path
        (20, 1, 8, 8, 5),   # block-sweep, whole pack is one ladder
        (10, 3, 2, 8, 4),   # two-rung ladders, odd problem count
    ],
)
def test_pt_trajectories_match_reference(n, B, M, reads, sweeps):
    rng = np.random.default_rng(n * 100 + B * 10 + M)
    Bx = B * M
    Q = jnp.asarray(np.triu(rng.uniform(-2, 2, (B, n, n)).astype(np.float32)))
    init01 = jnp.asarray(
        (rng.uniform(0, 1, (Bx, reads, n)) < 0.5).astype(np.float32)
    )
    uniforms = jnp.asarray(
        rng.uniform(0, 1, (sweeps, Bx, n, reads)).astype(np.float32)
    )
    swap_u = jnp.asarray(
        rng.uniform(0, 1, (sweeps, Bx, reads)).astype(np.float32)
    )

    got = pt_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, num_replicas=M,
        beta_target=1.0, interpret=True,
        debug_randoms=(init01, uniforms, swap_u),
    )
    want = _pt_reference_trajectory(
        np.asarray(Q), np.asarray(init01), np.asarray(uniforms),
        np.asarray(swap_u), M, sweeps, 1.0,
    )
    assert got.shape == (B, reads, n)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pt_kernel_statistics_match_oracle():
    """Semantic end-to-end check: the PT kernel under interpret with
    genuinely random host variates must track the exact Boltzmann marginals
    at the target beta (the same bar tempering.pt_sample passes)."""
    rng = np.random.default_rng(3)
    n, M, reads, sweeps = 5, 4, 384, 24
    Q = jnp.asarray(np.triu(rng.uniform(-1.5, 1.5, (1, n, n)).astype(np.float32)))
    Bx = M
    init01 = jnp.asarray((rng.uniform(0, 1, (Bx, reads, n)) < 0.5).astype(np.float32))
    uniforms = jnp.asarray(rng.uniform(0, 1, (sweeps, Bx, n, reads)).astype(np.float32))
    swap_u = jnp.asarray(rng.uniform(0, 1, (sweeps, Bx, reads)).astype(np.float32))
    s = pt_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, num_replicas=M,
        beta_target=1.0, interpret=True,
        debug_randoms=(init01, uniforms, swap_u),
    )[0]
    _, _, marg, _ = exact_boltzmann(Q[0], beta=1.0)
    assert np.allclose(np.asarray(s).mean(axis=0), np.asarray(marg), atol=0.08)


def test_heatbath_statistics_match_oracle():
    """Same semantic bar for the heat-bath rule: annealed to beta=1 with
    enough warmup, marginals track the exact distribution."""
    rng = np.random.default_rng(9)
    n, reads, sweeps = 6, 384, 48
    Q = jnp.asarray(np.triu(rng.uniform(-1, 1, (1, n, n)).astype(np.float32)))
    init01 = jnp.asarray((rng.uniform(0, 1, (1, reads, n)) < 0.5).astype(np.float32))
    uniforms = jnp.asarray(rng.uniform(0, 1, (sweeps, 1, n, reads)).astype(np.float32))
    s = gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, beta=1.0, interpret=True,
        debug_randoms=(init01, uniforms),
    )[0]
    _, _, marg, _ = exact_boltzmann(Q[0], beta=1.0)
    assert np.allclose(np.asarray(s).mean(axis=0), np.asarray(marg), atol=0.08)


def _pair_gibbs_reference_trajectory(Q, init01, uniforms, num_warmup, beta):
    """Same anneal via gibbs._pair_heat_bath_sweep with the kernel's beta
    formula."""
    from qbmx.samplers.gibbs import _pair_heat_bath_sweep

    B = Q.shape[0]
    hot0, _ = default_beta_range(Q)
    hot = jnp.minimum(hot0.astype(jnp.float32), jnp.float32(beta))
    if num_warmup == 1:
        hot = jnp.full_like(hot, beta)
    inv_span = np.float32(1.0 / max(num_warmup - 1, 1))
    out = []
    for b in range(B):
        h, J = split_qubo(Q[b])
        s = jnp.asarray(init01[b], jnp.float32)
        logr = jnp.log(jnp.float32(beta) / hot[b])
        for t in range(num_warmup):
            frac = jnp.float32(t) * inv_span
            bt = hot[b] * jnp.exp(logr * frac)
            s = _pair_heat_bath_sweep(
                s, jnp.asarray(uniforms[t, b], jnp.float32), bt, h, J)
        out.append(np.asarray(s))
    return np.stack(out)


@pytest.mark.parametrize(
    "n,B,reads,sweeps",
    [
        (20, 8, 8, 6),   # block-sweep, P=8, K=16 → 8 pairs per block
        (41, 1, 4, 4),   # odd n: trailing single-variable sub-step
        (5, 3, 8, 6),    # mask-geometry shape forced onto the block path
    ],
)
def test_pair_gibbs_trajectories_match_mirror(n, B, reads, sweeps):
    rng = np.random.default_rng(n * 37 + B)
    Q, init01, uniforms = _random_problem(rng, B, n, reads, sweeps)
    got = gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, beta=1.0, pair=True,
        interpret=True, debug_randoms=(init01, uniforms),
    )
    want = _pair_gibbs_reference_trajectory(Q, init01, uniforms, sweeps, 1.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pair_gibbs_statistics_match_oracle():
    """Pair-Gibbs preserves the Boltzmann distribution: XLA path vs the
    exact oracle at beta=1."""
    from qbmx.samplers.gibbs import gibbs_sample

    rng = np.random.default_rng(11)
    n = 6
    Q = jnp.asarray(np.triu(rng.uniform(-1, 1, (n, n))), jnp.float32)
    _, _, marg, pair_m = exact_boltzmann(Q, beta=1.0)
    s = gibbs_sample(jax.random.key(4), Q, 2048, num_warmup=64, beta=1.0,
                     pair=True)
    assert np.allclose(np.asarray(s).mean(axis=0), np.asarray(marg), atol=0.05)
    emp = np.einsum("mi,mj->ij", np.asarray(s), np.asarray(s)) / s.shape[0]
    assert np.allclose(emp, np.asarray(pair_m), atol=0.07)


def _quad_gibbs_reference_trajectory(Q, init01, uniforms, num_warmup, beta):
    """Same anneal via gibbs._quad_heat_bath_sweep with the kernel's beta
    formula."""
    from qbmx.samplers.gibbs import _quad_heat_bath_sweep

    B = Q.shape[0]
    hot0, _ = default_beta_range(Q)
    hot = jnp.minimum(hot0.astype(jnp.float32), jnp.float32(beta))
    if num_warmup == 1:
        hot = jnp.full_like(hot, beta)
    inv_span = np.float32(1.0 / max(num_warmup - 1, 1))
    out = []
    for b in range(B):
        h, J = split_qubo(Q[b])
        s = jnp.asarray(init01[b], jnp.float32)
        logr = jnp.log(jnp.float32(beta) / hot[b])
        for t in range(num_warmup):
            frac = jnp.float32(t) * inv_span
            bt = hot[b] * jnp.exp(logr * frac)
            s = _quad_heat_bath_sweep(
                s, jnp.asarray(uniforms[t, b], jnp.float32), bt, h, J)
        out.append(np.asarray(s))
    return np.stack(out)


@pytest.mark.parametrize(
    "n,B,reads,sweeps",
    [
        (20, 8, 8, 6),   # block-sweep, P=8, K=16 → 4 quads per block
        (41, 1, 4, 4),   # n%4=1: trailing single after the last quad
        (5, 3, 8, 6),    # mask-geometry shape forced onto the block path
        (7, 2, 8, 5),    # n%4=3: remainder pair + trailing single
        (10, 2, 8, 4),   # n%4=2: remainder pair
    ],
)
def test_quad_gibbs_trajectories_match_mirror(n, B, reads, sweeps):
    rng = np.random.default_rng(n * 37 + B)
    Q, init01, uniforms = _random_problem(rng, B, n, reads, sweeps)
    got = gibbs_sample_batch_pallas(
        jax.random.key(0), Q, reads, sweeps, beta=1.0, quad=True,
        interpret=True, debug_randoms=(init01, uniforms),
    )
    want = _quad_gibbs_reference_trajectory(Q, init01, uniforms, sweeps, 1.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_quad_gibbs_statistics_match_oracle():
    """Quad-Gibbs preserves the Boltzmann distribution: XLA path vs the
    exact oracle at beta=1 (marginals AND pair moments)."""
    from qbmx.samplers.gibbs import gibbs_sample

    rng = np.random.default_rng(11)
    n = 6
    Q = jnp.asarray(np.triu(rng.uniform(-1, 1, (n, n))), jnp.float32)
    _, _, marg, pair_m = exact_boltzmann(Q, beta=1.0)
    s = gibbs_sample(jax.random.key(4), Q, 2048, num_warmup=64, beta=1.0,
                     quad=True)
    assert np.allclose(np.asarray(s).mean(axis=0), np.asarray(marg), atol=0.05)
    emp = np.einsum("mi,mj->ij", np.asarray(s), np.asarray(s)) / s.shape[0]
    assert np.allclose(emp, np.asarray(pair_m), atol=0.07)


def test_quad_sampler_flag_routes(monkeypatch):
    """GibbsSampler(quad_updates=True) passes quad to the kernel route and
    to the XLA fallback; the default keeps pairs."""
    import qbmx.samplers.api as api_mod
    import qbmx.samplers.sa_pallas as sp

    from qbmx.samplers.api import GibbsSampler

    seen = {}

    def spy(key, Q, num_reads, num_warmup=64, beta=1.0, pair=False,
            quad=False, **kw):
        seen["kernel"] = (pair, quad)
        return jnp.zeros((Q.shape[0], num_reads, Q.shape[-1]), jnp.float32)

    monkeypatch.setattr(sp, "gibbs_sample_batch_pallas", spy)
    Q = jnp.zeros((2, 6, 6), jnp.float32)
    g = GibbsSampler(num_warmup=4, use_pallas=True, quad_updates=True)
    g.sample_batch(jax.random.key(0), Q, 8)
    assert seen["kernel"] == (False, True)
    g2 = GibbsSampler(num_warmup=4, use_pallas=True)
    g2.sample_batch(jax.random.key(0), Q, 8)
    assert seen["kernel"] == (True, False)

    def spy_xla(key, Q, num_reads, num_warmup=32, beta=1.0, pair=False,
                quad=False):
        seen["xla"] = (pair, quad)
        return jnp.zeros((Q.shape[0], num_reads, Q.shape[-1]), jnp.float32)

    monkeypatch.setattr(api_mod._gibbs, "gibbs_sample_batch", spy_xla)
    g3 = GibbsSampler(num_warmup=4, use_pallas=False, quad_updates=True)
    g3.sample_batch(jax.random.key(0), Q, 8)
    assert seen["xla"] == (False, True)


def test_bms_pt_routing(monkeypatch):
    """GibbsSampler shares SA's measured routing; PTSampler requires a
    power-of-two ladder dividing the pack and skips the large-batch XLA
    preference (XLA PT pays M rungs of the slow per-variable scan)."""
    import jax as _jax

    from qbmx.samplers.api import GibbsSampler, PTSampler

    class _FakeDev:
        platform = "tpu"

    monkeypatch.setattr(_jax, "devices", lambda *a, **k: [_FakeDev()])
    g = GibbsSampler(num_warmup=8)
    small = jax.ShapeDtypeStruct((60, 41, 41), jnp.float32)
    big = jax.ShapeDtypeStruct((600, 41, 41), jnp.float32)
    assert g._pallas_enabled(small, 100)
    assert not g._pallas_enabled(big, 100)  # same crossover as SA
    assert g._pallas_enabled(big, 1000)
    assert not g.scan_safe(41, 100)  # pallas-routed → no lax.scan (axon)

    pt = PTSampler(num_sweeps=8, num_replicas=8)
    assert pt._pallas_enabled(small, 100)
    assert pt._pallas_enabled(big, 100)  # no large-batch XLA preference
    assert not PTSampler(num_replicas=6)._pallas_enabled(small, 100)  # not 2^k
    assert not PTSampler(num_replicas=1)._pallas_enabled(small, 100)
    # M=16 can't divide the mask-geometry P=8 of stride-16 problems
    probe16 = jax.ShapeDtypeStruct((2, 14, 14), jnp.float32)
    from qbmx.samplers.sa_pallas import pack_geometry

    if pack_geometry(14, batch=32, reads=100)[1] % 16:
        assert not PTSampler(num_replicas=16)._pallas_enabled(probe16, 100)


def test_pt_scan_safe_groups_judges_densified_batch(monkeypatch):
    """PT has no lane variant: structured calls reach it through the
    densify fallback as a (G·B, n, n) batch, so scan-safety must be judged
    at THAT batch.  The old generic fallback probed B=1 via scan_safe,
    which can disagree with the real batch's route and put the packed
    kernel inside lax.scan — the axon AOT hang."""
    import jax as _jax

    from qbmx.samplers import api as api_mod
    from qbmx.samplers.api import PTSampler, sampler_scan_safe_groups

    class _FakeDev:
        platform = "tpu"

    monkeypatch.setattr(_jax, "devices", lambda *a, **k: [_FakeDev()])
    pt = PTSampler(num_sweeps=8, num_replicas=8)
    # invariant at several shapes: decision == NOT pallas at the densified
    # batch (the exact-shape rule sampler_scan_safe_groups documents)
    for n, B, G, R in [(41, 60, 2, 100), (14, 16, 2, 100), (23, 8, 4, 200),
                       (6, 60, 2, 1000)]:
        dens = jax.ShapeDtypeStruct((G * B, n, n), jnp.float32)
        assert pt.scan_safe_groups(n, B, R, groups=G) == (
            not pt._pallas_enabled(dens, R)), (n, B, G, R)
    # the generic entry point consults the exact-shape method, never the
    # B=1 scan_safe probe
    def boom(self, n, num_reads):
        raise AssertionError("B=1 probe used for a groups decision")

    monkeypatch.setattr(PTSampler, "scan_safe", boom)
    assert sampler_scan_safe_groups(pt, 41, 60, 100, groups=2) is False
