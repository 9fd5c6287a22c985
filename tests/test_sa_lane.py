"""CI coverage for the lane-stacked shared-coupling kernel (sa_lane).

Same strategy as test_sa_pallas_debug.py: with ``debug_randoms`` the init
bits and per-sweep uniforms are host inputs, so ``interpret=True`` runs on
CPU and both update rules are locked bit-for-bit against the XLA sweeps
(``sa_jax._metropolis_sweep`` / ``gibbs._heat_bath_sweep``) on the DENSE
per-problem QUBOs the structured (Q_shared, h_extra) call represents.
Covers single-chunk and multi-chunk (C > 1) grids, tail blocks (n % 8),
and the per-problem default schedule parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qbmx.samplers.sa_lane as sl
from qbmx.core.qubo import (
    default_beta_range,
    geometric_beta_schedule,
    random_qubo_batch,
    split_qubo,
)
from qbmx.samplers.gibbs import _heat_bath_sweep
from qbmx.samplers.sa_jax import _metropolis_sweep
from qbmx.samplers.sa_lane import lane_geometry, lane_sample_groups


def _problem(rng, G, B, n, reads, sweeps):
    Qg = random_qubo_batch(rng, G, n)
    h_extra = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    init01 = jnp.asarray((rng.random((G, B, reads, n)) < 0.5).astype(np.float32))
    uniforms = jnp.asarray(
        np.clip(rng.random((sweeps, G, B, n, reads)).astype(np.float32),
                1e-6, 1.0 - 1e-6)
    )
    return Qg, h_extra, init01, uniforms


def _dense(Qg, h_extra):
    return Qg[:, None, :, :] + jax.vmap(jax.vmap(jnp.diagflat))(h_extra)


def _ref_trajectory(sweep_fn, Qg, h_extra, init01, uniforms, hot, cold, S):
    """Run the dense XLA sweep per (group, problem) with the kernel's
    geometric schedule."""
    G, B = h_extra.shape[:2]
    out = np.zeros_like(np.asarray(init01))
    for g in range(G):
        h_s, J = split_qubo(Qg[g])
        for b in range(B):
            h = h_s + h_extra[g, b]
            betas = geometric_beta_schedule(hot[g, b], cold[g, b], S)
            s = init01[g, b]
            for t in range(S):
                s = sweep_fn(s, uniforms[t, g, b], betas[t], h, J)
            out[g, b] = np.asarray(s)
    return out


@pytest.mark.parametrize(
    "G,B,n,reads,sweeps",
    [
        (2, 5, 11, 7, 6),   # tail block (11 % 8), single chunk
        (1, 3, 8, 9, 4),    # exactly one full block
        (3, 2, 21, 5, 5),   # 3 blocks with tail
        (1, 1, 3, 1, 3),    # minimal
    ],
)
@pytest.mark.parametrize("rule", ["metropolis", "heatbath"])
def test_debug_matches_xla_sweeps(rule, G, B, n, reads, sweeps):
    rng = np.random.default_rng(hash((G, B, n, reads, sweeps)) % 2**32)
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)
    hot = jnp.full((G, B), 0.25)
    cold = jnp.full((G, B), 2.0)
    out = lane_sample_groups(
        jax.random.key(0), Qg, h_extra, reads, sweeps, rule=rule,
        beta_hot=hot, beta_cold=cold, interpret=True,
        debug_randoms=(init01, uniforms),
    )
    sweep = _metropolis_sweep if rule == "metropolis" else _heat_bath_sweep
    ref = _ref_trajectory(sweep, Qg, h_extra, init01, uniforms, hot, cold, sweeps)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_multi_chunk_grid_matches(monkeypatch):
    """C > 1 lane chunks must produce the identical trajectories (chunking
    is pure layout)."""
    rng = np.random.default_rng(7)
    G, B, n, reads, sweeps = 1, 3, 9, 700, 4
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)

    def tiny_chunks(n_, num_problems, num_reads, groups=1):
        n_pad = ((n_ + 7) // 8) * 8
        L = num_problems * num_reads
        return n_pad, 1024, -(-L // 1024), 8

    hot = jnp.full((G, B), 0.3)
    cold = jnp.full((G, B), 1.0)
    args = dict(rule="heatbath", beta_hot=hot, beta_cold=cold,
                interpret=True, debug_randoms=(init01, uniforms))
    one = lane_sample_groups(jax.random.key(0), Qg, h_extra, reads, sweeps, **args)
    monkeypatch.setattr(sl, "lane_geometry", tiny_chunks)
    lane_sample_groups.clear_cache()  # same shapes → would hit the C=1 trace
    many = lane_sample_groups(jax.random.key(0), Qg, h_extra, reads, sweeps, **args)
    assert sl.lane_geometry(n, B, reads)[2] > 1
    np.testing.assert_array_equal(np.asarray(one), np.asarray(many))
    monkeypatch.undo()
    lane_sample_groups.clear_cache()


def test_default_schedule_matches_dense():
    """The structured default beta range must equal default_beta_range on
    the densified per-problem QUBOs (same trajectories as the dense path)."""
    rng = np.random.default_rng(11)
    G, B, n, reads, sweeps = 2, 4, 10, 6, 5
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)
    out = lane_sample_groups(
        jax.random.key(0), Qg, h_extra, reads, sweeps, rule="metropolis",
        interpret=True, debug_randoms=(init01, uniforms),
    )
    Qd = _dense(Qg, h_extra)
    hot, cold = default_beta_range(Qd.reshape(G * B, n, n))
    ref = _ref_trajectory(_metropolis_sweep, Qg, h_extra, init01, uniforms,
                          hot.reshape(G, B), cold.reshape(G, B), sweeps)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_lane_geometry_limits():
    n_pad, Lc, C, fold = lane_geometry(41, 600, 100)
    assert n_pad == 48 and fold == 8
    assert Lc % (128 * fold) == 0 and C * Lc >= 600 * 100
    # truly huge problems → declined even at fold 1
    _, Lc_big, _, _ = lane_geometry(6000, 8, 100)
    assert Lc_big == 0
    # big-n shapes that the packed kernel serializes fit at a smaller fold
    n_pad, Lc, C, fold = lane_geometry(717, 200, 100)
    assert Lc > 0 and C >= 1 and fold < 8
    # the fold-1 path is exercised in CI too (debug test below)


def test_lane_geometry_group_budget():
    """ADVICE r3 (medium): a (G, C) grid with G > 1 pipelines double-
    buffered even at C == 1, so the generous single-program budget must be
    reserved for a TRUE single-program grid.  The reachable band n=41,
    R=100, per-group B=256–470 at G=2 (model training shapes) used to get
    the 36 MB single-chunk branch → a 29–53 MiB pipelined working set →
    compile-time VMEM OOM risk; it must now use the double-buffered
    budget's chunk size."""
    n, R = 41, 100
    n_pad, Lc_multi, _, fold = lane_geometry(n, 600, R)  # known multi-chunk
    assert fold == 8
    per_lane = 16 * n_pad
    for B in (256, 470):
        npad, Lc, C, f = lane_geometry(n, B, R, groups=2)
        assert f == fold and npad == n_pad
        # every per-program chunk obeys the double-buffered budget
        assert Lc <= Lc_multi
        j_bytes = 4 * (f * npad) ** 2
        assert 2 * j_bytes + per_lane * Lc <= sl._VMEM_MULTI
        assert C * Lc >= B * R
        # the G=1 single-program branch is unchanged (fits the 36 MB budget
        # in one chunk at these lane counts)
        _, Lc1, C1, _ = lane_geometry(n, B, R, groups=1)
        assert C1 == 1 and per_lane * Lc1 + j_bytes <= sl._VMEM_SINGLE
    # a G>1 shape whose lanes fit one double-buffered chunk stays C == 1
    _, Lc_s, C_s, _ = lane_geometry(9, 60, 100, groups=2)
    assert C_s == 1


@pytest.mark.parametrize("rule", ["heatbath", "metropolis"])
@pytest.mark.parametrize("fold", [1, 2, 4])
def test_small_fold_matches(monkeypatch, fold, rule):
    """Sub-8 folds (large-n routing) are pure layout: same trajectories.

    Both rules cover the single-sub-step block path — at fold < 8 the row
    slabs are loaded/stored once per block and sliced as values (Mosaic
    cannot prove 8-alignment of dynamic fold-row refs; the unfixed ref
    form compile-errored on hardware at the r5 fold=4 metropolis shape
    n=149)."""
    rng = np.random.default_rng(100 + fold)
    G, B, n, reads, sweeps = 1, 2, 13, 40, 4
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)

    def forced(n_, num_problems, num_reads, groups=1):
        n_pad = ((n_ + 7) // 8) * 8
        L = num_problems * num_reads
        q = 128 * fold
        Lc = ((L + q - 1) // q) * q
        return n_pad, Lc, 1, fold

    hot = jnp.full((G, B), 0.3)
    cold = jnp.full((G, B), 1.0)
    args = dict(rule=rule, beta_hot=hot, beta_cold=cold,
                interpret=True, debug_randoms=(init01, uniforms))
    base = lane_sample_groups(jax.random.key(0), Qg, h_extra, reads, sweeps, **args)
    monkeypatch.setattr(sl, "lane_geometry", forced)
    lane_sample_groups.clear_cache()
    out = lane_sample_groups(jax.random.key(0), Qg, h_extra, reads, sweeps, **args)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    monkeypatch.undo()
    lane_sample_groups.clear_cache()


def test_sample_groups_fallback_matches_dense():
    """Off-TPU, sample_groups must be EXACTLY the dense sample_batch on the
    densified problems (same key stream), for samplers with and without a
    structured fast path."""
    from qbmx.samplers.api import (
        ExactSampler,
        GibbsSampler,
        densify_groups,
        sampler_sample_groups,
    )

    rng = np.random.default_rng(5)
    G, B, n, R = 2, 3, 6, 64
    Qg = random_qubo_batch(rng, G, n)
    h_extra = jnp.asarray(rng.normal(size=(G, B, n)).astype(np.float32))
    Qd = densify_groups(Qg, h_extra)
    np.testing.assert_allclose(
        np.asarray(Qd.reshape(G, B, n, n)),
        np.asarray(_dense(Qg, h_extra)), rtol=1e-6)

    key = jax.random.key(3)
    for sampler in [GibbsSampler(num_warmup=8), ExactSampler()]:
        grp = sampler_sample_groups(sampler, key, Qg, h_extra, R)
        assert grp.shape == (G, B, R, n)
        flat = sampler.sample_batch(key, Qd, R)
        np.testing.assert_array_equal(
            np.asarray(grp), np.asarray(flat.reshape(G, B, R, n)))


def test_quad_updates_demote_to_pairs_on_lane_route(monkeypatch):
    """``GibbsSampler(quad_updates=True, pair_updates=False)`` must run
    PAIRS on the lane route (quad takes precedence over pair_updates and
    demotes to pairs there — no lane quad variant), never single-variable
    sweeps (VERDICT r4 review: the old expression dropped to singles)."""
    import qbmx.samplers.api as api
    from qbmx.samplers import sa_lane as sl

    captured = {}

    def fake_lane(key, Qg, h_extra, num_reads, warmup, **kw):
        captured.update(kw)
        G, B = h_extra.shape[:2]
        return jnp.zeros((G, B, num_reads, Qg.shape[-1]))

    monkeypatch.setattr(sl, "lane_sample_groups", fake_lane)
    monkeypatch.setattr(api, "_lane_enabled", lambda *a, **k: True)
    rng = np.random.default_rng(0)
    Qg = random_qubo_batch(rng, 2, 6)
    h_extra = jnp.asarray(rng.normal(size=(2, 3, 6)).astype(np.float32))
    for sampler, want in [
        (api.GibbsSampler(quad_updates=True, pair_updates=False), True),
        (api.GibbsSampler(pair_updates=False), False),
        (api.GibbsSampler(), True),
    ]:
        captured.clear()
        sampler.sample_groups(jax.random.key(0), Qg, h_extra, 8)
        assert captured["pair"] is want, (sampler, captured)


@pytest.mark.parametrize("G,B,n,reads,sweeps", [(2, 3, 11, 7, 5), (1, 2, 8, 9, 4)])
def test_pair_debug_matches_xla_pair_sweep(G, B, n, reads, sweeps):
    """Lane pair-Gibbs vs gibbs._pair_heat_bath_sweep, bit-for-bit (same
    uniform consumption: pair (i, i+1) draws from u[i])."""
    from qbmx.samplers.gibbs import _pair_heat_bath_sweep

    rng = np.random.default_rng(42 + n)
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)
    hot = jnp.full((G, B), 0.25)
    cold = jnp.full((G, B), 2.0)
    out = lane_sample_groups(
        jax.random.key(0), Qg, h_extra, reads, sweeps, rule="heatbath",
        beta_hot=hot, beta_cold=cold, pair=True, interpret=True,
        debug_randoms=(init01, uniforms),
    )
    ref = _ref_trajectory(_pair_heat_bath_sweep, Qg, h_extra, init01,
                          uniforms, hot, cold, sweeps)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("fold", [1, 2, 4])
def test_pair_small_fold_matches_xla_pair_sweep(monkeypatch, fold):
    """Pair-Gibbs at sub-8 folds (the large-n routing that ships pair by
    default) locked bit-for-bit against the XLA pair sweep."""
    from qbmx.samplers.gibbs import _pair_heat_bath_sweep

    rng = np.random.default_rng(200 + fold)
    G, B, n, reads, sweeps = 1, 2, 13, 40, 4
    Qg, h_extra, init01, uniforms = _problem(rng, G, B, n, reads, sweeps)

    def forced(n_, num_problems, num_reads, groups=1):
        n_pad = ((n_ + 7) // 8) * 8
        L = num_problems * num_reads
        q = 128 * fold
        Lc = ((L + q - 1) // q) * q
        return n_pad, Lc, 1, fold

    hot = jnp.full((G, B), 0.3)
    cold = jnp.full((G, B), 1.0)
    monkeypatch.setattr(sl, "lane_geometry", forced)
    lane_sample_groups.clear_cache()
    out = lane_sample_groups(
        jax.random.key(0), Qg, h_extra, reads, sweeps, rule="heatbath",
        beta_hot=hot, beta_cold=cold, pair=True, interpret=True,
        debug_randoms=(init01, uniforms),
    )
    ref = _ref_trajectory(_pair_heat_bath_sweep, Qg, h_extra, init01,
                          uniforms, hot, cold, sweeps)
    np.testing.assert_array_equal(np.asarray(out), ref)
    monkeypatch.undo()
    lane_sample_groups.clear_cache()


def test_lane_layout_viz(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from qbmx.utils.viz import plot_lane_layout

    fig = plot_lane_layout(41, 600, 100, save_path=str(tmp_path / "lane.png"))
    assert fig is not None and (tmp_path / "lane.png").exists()
    assert plot_lane_layout(717, 200, 100) is not None  # fold-1 geometry


def test_lane_routing_rules():
    """Pin the measured lane-vs-packed routing decisions (PERFORMANCE.md §1;
    the rule is hardware-measured — these assertions keep refactors from
    silently flipping a routed shape)."""
    from qbmx.samplers.api import _lane_preferred

    # few-reads shapes: lane wins (2.3–5× measured)
    assert _lane_preferred(41, 600, 100)
    assert _lane_preferred(6, 1200, 128)
    assert _lane_preferred(41, 60, 100)
    assert _lane_preferred(717, 200, 100)  # fold-1 big-n shape (4.3×)
    # many-reads multi-chunk: packed+pair keeps the edge
    assert not _lane_preferred(6, 1200, 1000)
    assert not _lane_preferred(9, 2160, 1000)
    # many-reads single-chunk with a tiny program count: lane (tie or better)
    assert _lane_preferred(6, 120, 1000)
    # seed-parallel grouping at many reads: 20 lane programs vs 13 packed
    assert not _lane_preferred(6, 20, 1000, groups=20)
    # beyond the VMEM ceiling even at fold 1
    assert not _lane_preferred(6000, 8, 100)


def test_epoch_scan_decision_uses_real_call_shapes(monkeypatch):
    """The epoch-scan decision must probe the step's REAL structured-call
    shapes: a groups=2 probe for a linear-shortcut DQBM (whose step makes
    a 1-group call) could select lax.scan while the actual call routes to
    the packed kernel — which hangs the axon AOT compiler inside scan
    (code-review finding, late r3).  Simulated on CPU by forcing the TPU
    routing predicates."""
    import qbmx.samplers.api as api
    from qbmx.models.dqbm import DiscQBM

    monkeypatch.setattr(api, "_on_tpu", lambda: True)

    # review scenario: big-n shortcut model where the dense 2B probe says
    # XLA (scan-safe) but the REAL 1-group call routes packed (hangs)
    n, B, reads = 1255, 150, 20
    assert not api._lane_preferred(n, B, reads, groups=1)  # lane declines
    probe_2g = api.sampler_scan_safe_groups(
        api.SASampler(), n, B, reads, groups=2)
    probe_1g = api.sampler_scan_safe_groups(
        api.SASampler(), n, B, reads, groups=1)
    assert probe_2g and not probe_1g  # the mismatch the fix closes

    m = DiscQBM(dim_input=4, n_hidden_nodes=n - 1, seed=0, sample_count=reads,
                restricted=True, use_linear_shortcut=True)
    assert m._qubo_n() == n
    assert m._sampler_call_groups() == 1
    # the model now declines the scan (uses its real 1-group shapes)
    assert not m.supports_epoch_scan(B)

    m2 = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=reads)
    assert m2._sampler_call_groups() == 2


def test_lane_seed_table_per_group_isolation():
    """The on-chip PRNG seed table (r5, VERDICT r4 Weak #4): row g must be
    a pure function of group g's key(s) alone — per-seed trajectory
    reproducibility on the lane sweep route depends on it — and rows must
    be distinct (no cross-group stream collisions from the finalizer)."""
    from qbmx.samplers.sa_lane import _lane_seed_table

    kA, kB, kC = (jax.random.key(i) for i in (1, 2, 3))
    t1 = np.asarray(_lane_seed_table(jnp.stack([kA, kB]), 2, 3))
    t2 = np.asarray(_lane_seed_table(jnp.stack([kA, kC]), 2, 3))
    assert np.array_equal(t1[0], t2[0])  # group 0 untouched by group 1's key
    assert not np.array_equal(t1[1], t2[1])

    # (G, B) per-problem key rows: same isolation property
    kk = jax.random.split(jax.random.key(0), 6).reshape(2, 3)
    kk2 = kk.at[1].set(jax.random.split(jax.random.key(9), 3))
    u1 = np.asarray(_lane_seed_table(kk, 2, 2))
    u2 = np.asarray(_lane_seed_table(kk2, 2, 2))
    assert np.array_equal(u1[0], u2[0])
    assert not np.array_equal(u1[1], u2[1])

    # flat group-major (G*B,) keys — the sweep's gkeys.reshape(2*S*B) form —
    # must agree with the (G, B) form
    u3 = np.asarray(_lane_seed_table(kk.reshape(-1), 2, 2))
    assert np.array_equal(u1, u3)

    # scalar-key path: full-shape table, all entries distinct, non-negative
    t3 = np.asarray(_lane_seed_table(jax.random.key(5), 4, 2))
    assert t3.shape == (4, 2)
    assert len(np.unique(t3)) == 8 and t3.min() >= 0
