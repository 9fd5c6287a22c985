"""Routing-invariant property tests (VERDICT r4 #4).

The kernel routers carry measured constants (26M-flop MXU knee, 16 MiB
scoped-VMEM split, lane thresholds) that CI previously pinned only at
specific shapes — exactly the bug class behind the round-3 VMEM OOM and
scan divergence.  These tests sweep hundreds of randomized (n, B, R, G)
tuples asserting:

1. ``pack_geometry`` / ``lane_geometry`` outputs always satisfy their own
   VMEM/MXU budget formulas (and alignment invariants);
2. the ``scan_safe_groups`` decision equals the route ``sample_groups``
   actually takes (route-recorder with ``_on_tpu`` forced True — no TPU
   needed, the kernels themselves are stubbed);
3. PT's pack geometry keeps whole ladders inside one pack (P % M == 0)
   whenever the router accepts the shape.

All pure host math + stubbed kernels: runs in the default CPU tier.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qbmx.samplers import api
from qbmx.samplers import sa_lane, sa_pallas
from qbmx.samplers.api import GibbsSampler, PTSampler, SASampler
from qbmx.samplers.sa_lane import _VMEM_MULTI, _VMEM_SINGLE, lane_geometry
from qbmx.samplers.sa_pallas import (
    _MXU_WORK_BUDGET,
    _VMEM_BUDGET,
    pack_geometry,
)

# representative + adversarial shape pool: model shapes (clamped h5..h10,
# unclamped, CDQBM n=41/245/717), VMEM-edge n, and uniform fill
NS = sorted(set(
    [1, 2, 3, 5, 6, 9, 10, 16, 41, 64, 100, 245, 400, 717, 1000, 1100, 1190, 1300, 2000]
    + [int(x) for x in np.random.default_rng(20260820).integers(1, 1400, size=60)]
))
BS = [1, 2, 7, 8, 20, 60, 73, 120, 256, 470, 600, 1200]
RS = [1, 16, 100, 128, 200, 256, 512, 1000, 1024]
GS = [1, 2, 3, 4]


def _tuples(k=400, seed=0):
    """Deterministic PER-CALL draw stream: a shared module RNG would make
    every test's tuples (and any filtered-count assertion) depend on which
    tests ran before it."""
    rng = np.random.default_rng(20260820 + seed)
    for _ in range(k):
        yield (int(rng.choice(NS)), int(rng.choice(BS)),
               int(rng.choice(RS)), int(rng.choice(GS)))


def _r128(x):
    return -(-x // 128) * 128


class TestPackGeometryInvariants:
    def test_alignment_and_budgets(self):
        for n, B, R, _ in _tuples(500, seed=1):
            stride, P, N = pack_geometry(n, batch=B, reads=R)
            Rr = _r128(R if R else 128)
            assert stride % 8 == 0 and stride >= n + 1
            assert N % 128 == 0 and stride * P <= N, (n, B, R, stride, P, N)
            small_branch = stride <= 16 and Rr <= 128
            if small_branch:
                assert P == 128 // stride
                continue
            assert P in (1, 8, 16, 32, 64, 128), (n, B, R, P)
            if P > 1:
                # a loop-accepted P satisfies every budget it was tested
                # against (pack_geometry's own formulas)
                assert P * N * Rr <= _MXU_WORK_BUDGET, (n, B, R, P, N)
                if B > P:
                    assert 4 * (2 * N * N + 3 * N * Rr) <= 15 * 2**20, (n, B, R, P, N)
                else:
                    assert 4 * (N * N + 2 * N * Rr) <= _VMEM_BUDGET, (n, B, R, P, N)

    def test_router_acceptance_implies_vmem_fit(self):
        """The route contract: whenever _auto_route_packed says Pallas, the
        chosen geometry must satisfy the multi-/single-pack VMEM split
        (the P=1 fallback can exceed it — the router must decline those)."""
        # _auto_route_packed needs _on_tpu True to say yes; patch it
        orig = api._on_tpu
        api._on_tpu = lambda: True
        try:
            for n, B, R, _ in _tuples(400, seed=2):
                probe = jax.ShapeDtypeStruct((B, n, n), jnp.float32)
                if not api._auto_route_packed(probe, R, None):
                    continue
                stride, P, N = pack_geometry(n, batch=B, reads=R)
                Rr = _r128(R)
                if B > P:
                    assert 4 * (2 * N * N + 3 * N * Rr) <= 15 * 2**20, (n, B, R, P, N)
                else:
                    assert 4 * (N * N + 2 * N * Rr) <= _VMEM_BUDGET, (n, B, R, P, N)
        finally:
            api._on_tpu = orig


class TestLaneGeometryInvariants:
    def test_budget_and_alignment(self):
        for n, B, R, G in _tuples(500, seed=3):
            n_pad, Lc, C, fold = lane_geometry(n, B, R, groups=G)
            assert n_pad % 8 == 0 and n_pad >= n
            if Lc == 0:
                continue  # declined — nothing to check
            assert fold in (8, 4, 2, 1)
            assert Lc % (128 * fold) == 0, (n, B, R, G, Lc, fold)
            assert C >= 1 and C * Lc >= B * R
            j_bytes = 4 * (fold * n_pad) ** 2
            per_lane = 16 * n_pad
            single_program = G == 1 and C == 1 and \
                j_bytes + per_lane * Lc <= _VMEM_SINGLE
            if not single_program:
                # any multi-program grid double-buffers under the 16 MiB
                # scoped-VMEM limit: the kernel's own budget model is
                # 2·J + per-lane arrays ≤ _VMEM_MULTI
                assert 2 * j_bytes + per_lane * Lc <= _VMEM_MULTI, (
                    n, B, R, G, n_pad, Lc, C, fold,
                    2 * j_bytes + per_lane * Lc, _VMEM_MULTI)

    def test_single_chunk_when_it_fits(self):
        """If all lanes fit one chunk the geometry must not split (C == 1):
        splitting a fitting shape wastes sequential programs."""
        for n, B, R, G in _tuples(200, seed=4):
            n_pad, Lc, C, fold = lane_geometry(n, B, R, groups=G)
            if Lc == 0 or C == 1:
                continue
            lane_q = 128 * fold
            L_pad = -(-B * R // lane_q) * lane_q
            assert L_pad > Lc, (n, B, R, G, Lc, C)


def _route_recorder(monkeypatch, record):
    """Force the TPU routing decisions on CPU and stub the three executable
    routes with recorders that return correctly-shaped zeros."""
    monkeypatch.setattr(api, "_on_tpu", lambda: True)

    def fake_lane(key, Q_shared, h_extra, num_reads, *a, **kw):
        record.append("lane")
        G, B, n = h_extra.shape
        return jnp.zeros((G, B, num_reads, n), jnp.float32)

    def fake_packed(key, Q, num_reads, *a, **kw):
        record.append("packed")
        return jnp.zeros((Q.shape[0], num_reads, Q.shape[-1]), jnp.float32)

    def fake_xla(key, Q, num_reads, *a, **kw):
        record.append("xla")
        return jnp.zeros((Q.shape[0], num_reads, Q.shape[-1]), jnp.float32)

    # routing is shape-only: skip the real densify (it jit-compiles a new
    # vmapped diagflat per distinct shape — 40s of compile across the sweep)
    monkeypatch.setattr(api, "densify_groups", lambda Q, h: jnp.zeros(
        (h.shape[0] * h.shape[1], Q.shape[-1], Q.shape[-1]), jnp.float32))
    monkeypatch.setattr(sa_lane, "lane_sample_groups", fake_lane)
    monkeypatch.setattr(sa_pallas, "sa_sample_batch_pallas", fake_packed)
    monkeypatch.setattr(sa_pallas, "gibbs_sample_batch_pallas", fake_packed)
    from qbmx.samplers import gibbs, sa_jax

    monkeypatch.setattr(sa_jax, "sa_sample_batch", fake_xla)
    monkeypatch.setattr(gibbs, "gibbs_sample_batch", fake_xla)


@pytest.mark.parametrize("make_sampler", [
    lambda: SASampler(num_sweeps=4),
    lambda: GibbsSampler(num_warmup=4),
], ids=["SASampler", "GibbsSampler"])
class TestScanDecisionMatchesRoute:
    def test_decision_equals_executed_route(self, monkeypatch, make_sampler):
        """The epoch-launch contract: scan_safe_groups(shape) is True iff
        the route sample_groups actually takes at that shape is scan-safe
        (lane or XLA — the packed kernel hangs the axon AOT compiler
        inside lax.scan)."""
        record = []
        _route_recorder(monkeypatch, record)
        sampler = make_sampler()
        checked = 0
        for n, B, R, G in _tuples(2000, seed=7):
            if checked >= 40:
                break
            # routing boundaries live at R<=128 vs >128/256 and B>=256;
            # bigger R/n only inflate the stub output arrays
            if n > 128 or B * G > 1400 or R > 256:
                continue  # keep densified host arrays small; routing still varies
            Q_shared = jnp.zeros((G, n, n), jnp.float32)
            h_extra = jnp.zeros((G, B, n), jnp.float32)
            decision = sampler.scan_safe_groups(n, B, R, groups=G)
            record.clear()
            out = api.sampler_sample_groups(
                sampler, jax.random.key(0), Q_shared, h_extra, R)
            assert out.shape == (G, B, R, n)
            assert len(record) == 1, (n, B, R, G, record)
            route = record[0]
            assert decision == (route != "packed"), (
                n, B, R, G, decision, route)
            checked += 1
        assert checked >= 40  # the filter must not hollow the sweep out


class TestPTPackDivisibility:
    def test_router_acceptance_implies_ladder_fit(self, monkeypatch):
        """Whenever PTSampler routes to the packed kernel, whole ladders
        fit packs exactly (P % M == 0) and the VMEM split holds — a rung
        straddling a pack boundary would silently break replica exchange."""
        monkeypatch.setattr(api, "_on_tpu", lambda: True)
        accepted = 0
        for n, B, R, _ in _tuples(300, seed=5):
            for M in (2, 4, 8, 16):
                s = PTSampler(num_sweeps=4, num_replicas=M)
                probe = jax.ShapeDtypeStruct((B, n, n), jnp.float32)
                if not s._pallas_enabled(probe, R):
                    continue
                stride, P, N = pack_geometry(n, batch=B * M, reads=R, min_p=M)
                assert P % M == 0, (n, B, R, M, P)
                Rr = _r128(R)
                if B * M > P:
                    assert 4 * (2 * N * N + 3 * N * Rr) <= 15 * 2**20
                else:
                    assert 4 * (N * N + 2 * N * Rr) <= _VMEM_BUDGET
                accepted += 1
        assert accepted >= 50
