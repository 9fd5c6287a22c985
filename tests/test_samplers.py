"""Sampler validation against the exact Boltzmann oracle.

The reference has no tests; its samplers were trusted third-party code
(dwave-neal).  Here every sampler is checked statistically against exact
enumeration on small problems (SURVEY.md §4: "statistical tests for the
sampler against exact Boltzmann enumeration on ≤20-variable problems").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.core.qubo import (
    default_beta_range,
    geometric_beta_schedule,
    qubo_energies,
    qubo_energy,
    split_qubo,
)
from qbmx.samplers.exact import (
    enumerate_states,
    exact_boltzmann,
    exact_sample,
    solve_linear_qubo,
)
from qbmx.samplers.gibbs import gibbs_sample, gibbs_sample_batch
from qbmx.samplers.sa_jax import sa_sample, sa_sample_batch


def random_qubo(rng, n, scale=1.0):
    Q = np.triu(rng.uniform(-scale, scale, (n, n)))
    return jnp.asarray(Q, dtype=jnp.float32)


class TestCore:
    def test_split_roundtrip_energy(self, rng):
        n = 6
        Q = random_qubo(rng, n)
        s = jnp.asarray(rng.integers(0, 2, n), dtype=jnp.float32)
        # brute-force energy from the dense convention
        Qnp = np.asarray(Q)
        snp = np.asarray(s)
        expected = snp @ np.diag(Qnp) + sum(
            (Qnp[i, j] + Qnp[j, i]) * snp[i] * snp[j]
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert np.allclose(qubo_energy(Q, s), expected, atol=1e-5)

    def test_batched_energies(self, rng):
        Q = random_qubo(rng, 5)
        S = jnp.asarray(rng.integers(0, 2, (7, 5)), dtype=jnp.float32)
        es = qubo_energies(Q, S)
        for i in range(7):
            assert np.allclose(es[i], qubo_energy(Q, S[i]), atol=1e-5)

    def test_split_symmetric(self, rng):
        Q = random_qubo(rng, 8)
        h, J = split_qubo(Q)
        assert np.allclose(J, J.T)
        assert np.allclose(np.diagonal(J), 0.0)

    def test_beta_range_monotone(self, rng):
        Q = random_qubo(rng, 8)
        hot, cold = default_beta_range(Q)
        assert float(hot) < float(cold)
        betas = geometric_beta_schedule(hot, cold, 16)
        assert betas.shape[0] == 16
        assert np.all(np.diff(np.asarray(betas)) > 0)

    def test_beta_range_degenerate_zero_qubo(self):
        Q = jnp.zeros((4, 4))
        hot, cold = default_beta_range(Q)
        assert np.isfinite(float(hot)) and np.isfinite(float(cold))
        assert float(hot) < float(cold)


class TestExact:
    def test_enumerate(self):
        st = enumerate_states(3)
        assert st.shape == (8, 3)
        assert len({tuple(np.asarray(r)) for r in st}) == 8

    def test_boltzmann_uniform_at_zero_coupling(self):
        Q = jnp.zeros((4, 4))
        _, probs, marg, _ = exact_boltzmann(Q)
        assert np.allclose(probs, 1 / 16, atol=1e-6)
        assert np.allclose(marg, 0.5, atol=1e-6)

    def test_boltzmann_strong_bias(self):
        # strongly negative bias -> marginal ~1; strongly positive -> ~0
        Q = jnp.diag(jnp.asarray([-10.0, 10.0]))
        _, _, marg, _ = exact_boltzmann(Q)
        assert marg[0] > 0.99 and marg[1] < 0.01

    def test_exact_sample_matches_marginals(self, rng):
        Q = random_qubo(rng, 5, scale=2.0)
        _, _, marg, _ = exact_boltzmann(Q)
        s = exact_sample(jax.random.key(0), Q, 4000)
        assert np.allclose(s.mean(axis=0), marg, atol=0.04)

    def test_solve_linear(self):
        h = jnp.asarray([-1.0, 2.0, 0.0])
        s = solve_linear_qubo(jax.random.key(0), h, 64)
        assert np.all(np.asarray(s[:, 0]) == 1.0)
        assert np.all(np.asarray(s[:, 1]) == 0.0)
        # ties: one coin per variable shared across reads (reference
        # convention), so the read-mean is exactly 0 or 1, and varies by key
        fracs = {
            float(solve_linear_qubo(jax.random.key(k), h, 64)[:, 2].mean())
            for k in range(16)
        }
        assert fracs <= {0.0, 1.0} and len(fracs) == 2


class TestSAJax:
    @pytest.mark.parametrize("n", [2, 5, 8])
    def test_marginals_match_oracle(self, rng, n):
        """With enough sweeps SA at a cold end ~ finds low-energy states;
        statistical parity: marginals near the exact Boltzmann marginals of
        a moderately coupled problem at the cold beta."""
        Q = random_qubo(rng, n, scale=0.5)
        reads, sweeps = 512, 200
        samples = sa_sample(jax.random.key(1), Q, reads, sweeps)
        assert samples.shape == (reads, n)
        assert set(np.unique(np.asarray(samples))) <= {0.0, 1.0}
        # SA ends near the cold beta of the default schedule; compare against
        # the exact distribution at that beta.
        _, cold = default_beta_range(Q)
        _, _, marg, _ = exact_boltzmann(Q, beta=float(cold))
        assert np.allclose(samples.mean(axis=0), marg, atol=0.12)

    def test_finds_ground_state(self, rng):
        """On a problem with a clear minimum, most chains end in it."""
        Q = random_qubo(rng, 8, scale=3.0)
        states = enumerate_states(8)
        energies = np.asarray(qubo_energies(Q, states))
        gs = states[int(np.argmin(energies))]
        samples = sa_sample(jax.random.key(2), Q, 256, 300)
        hits = np.mean(np.all(np.asarray(samples) == np.asarray(gs), axis=1))
        assert hits > 0.5

    def test_chains_are_decorrelated(self, rng):
        """Unlike the reference (same seed in all 10 SA workers,
        SURVEY.md §2c.4), chains must not be identical copies."""
        Q = random_qubo(rng, 6, scale=0.2)  # weak couplings -> diffuse dist
        hot = jnp.asarray(0.5, dtype=jnp.float32)
        cold = jnp.asarray(1.0, dtype=jnp.float32)  # mild schedule: stay diffuse
        samples = np.asarray(
            sa_sample(jax.random.key(3), Q, 64, 50, beta_range=(hot, cold))
        )
        assert len({tuple(r) for r in samples}) > 5

    def test_batch_matches_single(self, rng):
        Qs = jnp.stack([random_qubo(rng, 5, scale=1.0) for _ in range(3)])
        out = sa_sample_batch(jax.random.key(4), Qs, 256, 100)
        assert out.shape == (3, 256, 5)
        # each problem's sample stats should track its own oracle
        for b in range(3):
            _, cold = default_beta_range(Qs[b])
            _, _, marg, _ = exact_boltzmann(Qs[b], beta=float(cold))
            assert np.allclose(out[b].mean(axis=0), marg, atol=0.15)


class TestGibbs:
    def test_matches_boltzmann_at_beta1(self, rng):
        Q = random_qubo(rng, 6, scale=1.0)
        _, _, marg, pair = exact_boltzmann(Q, beta=1.0)
        s = gibbs_sample(jax.random.key(5), Q, 2048, num_warmup=64, beta=1.0)
        assert np.allclose(s.mean(axis=0), marg, atol=0.05)
        emp_pair = np.einsum("mi,mj->ij", np.asarray(s), np.asarray(s)) / s.shape[0]
        assert np.allclose(emp_pair, pair, atol=0.07)

    def test_batch_shape(self, rng):
        Qs = jnp.stack([random_qubo(rng, 4) for _ in range(2)])
        out = gibbs_sample_batch(jax.random.key(6), Qs, 32, num_warmup=8)
        assert out.shape == (2, 32, 4)


class TestPallasRouting:
    """Pack geometry + auto-routing. The kernel itself needs TPU hardware
    (on-chip PRNG has no interpreter support); its statistics are validated
    on-device by scripts/validate_pallas_tpu.py — measured on v5e: mean
    marginal gap vs the XLA sampler 0.008 over 60 random 6-var problems."""

    def test_pack_geometry(self):
        """Measured routing rules (sa_pallas routing constants): P grows
        with the batch until the per-substep MXU work knee (~26M flops) or
        VMEM; P is capped at the batch's next power of two."""
        from qbmx.samplers.sa_pallas import pack_geometry

        assert pack_geometry(5) == (8, 16, 128)   # 16 flat-QBM problems/tile
        # the n=41 CDQBM shape: R=128 packs 64 problems, R=1024 backs off
        assert pack_geometry(41, batch=60, reads=100) == (48, 64, 3072)
        assert pack_geometry(41, batch=60, reads=1000) == (48, 16, 768)
        # small stride at many reads leaves the mask path, packs 32
        assert pack_geometry(6, batch=120, reads=1000)[1] == 32
        # batch cap: 8 problems never pack more than 8 per tile
        assert pack_geometry(130, batch=8, reads=100)[1] == 8
        # single problem → P=1
        assert pack_geometry(300, batch=1)[1] == 1

    def test_vmem_budget_routing(self):
        """Auto-routing: the chosen geometry's couplings+state+uniforms must
        fit the VMEM budget; beyond that the XLA sampler takes over."""
        from qbmx.samplers.sa_pallas import _VMEM_BUDGET, pack_geometry

        assert pack_geometry(6)[1] >= 8      # packed
        for n, batch, reads, fits in [(6, 60, 128, True), (717, 8, 128, True),
                                      (4000, 8, 128, False)]:
            stride, P, N = pack_geometry(n, batch=batch, reads=reads)
            R = -(-reads // 128) * 128
            vmem = 4 * (N * N + 2 * N * R)
            assert (vmem <= _VMEM_BUDGET) == fits, n


class TestParallelTempering:
    def test_matches_boltzmann_at_target(self, rng):
        from qbmx.samplers.tempering import pt_sample

        Q = random_qubo(rng, 6, scale=1.5)
        _, _, marg, pair = exact_boltzmann(Q, beta=1.0)
        s = pt_sample(jax.random.key(0), Q, 1024, num_sweeps=48, num_replicas=6)
        assert s.shape == (1024, 6)
        assert np.allclose(s.mean(axis=0), marg, atol=0.06)
        emp_pair = np.einsum("mi,mj->ij", np.asarray(s), np.asarray(s)) / s.shape[0]
        assert np.allclose(emp_pair, pair, atol=0.08)

    def test_beats_plain_gibbs_on_frustrated_problem(self, rng):
        """On a bimodal (frustrated ferromagnet-pair) landscape with a high
        barrier, PT's cold rung should track the exact marginals at least as
        well as equal-budget one-way annealed Gibbs."""
        from qbmx.samplers.gibbs import gibbs_sample
        from qbmx.samplers.tempering import pt_sample

        n = 8
        # two cliques with strong internal ferromagnetic coupling and biases
        # arranged to make two near-degenerate modes
        Q = np.zeros((n, n), dtype="float32")
        for i in range(4):
            for j in range(i + 1, 4):
                Q[i, j] = -3.0
                Q[i + 4, j + 4] = -3.0
        Q[np.arange(4), np.arange(4)] = 4.4
        Q[np.arange(4, 8), np.arange(4, 8)] = 4.6
        Q = jnp.asarray(Q)
        _, _, marg, _ = exact_boltzmann(Q, beta=1.0)

        s_pt = pt_sample(jax.random.key(1), Q, 512, num_sweeps=64, num_replicas=8)
        s_gb = gibbs_sample(jax.random.key(1), Q, 512, num_warmup=64, beta=1.0)
        err_pt = np.abs(np.asarray(s_pt.mean(axis=0)) - np.asarray(marg)).max()
        err_gb = np.abs(np.asarray(s_gb.mean(axis=0)) - np.asarray(marg)).max()
        assert err_pt < max(err_gb + 0.02, 0.1)

    def test_batch_shape(self, rng):
        from qbmx.samplers.tempering import pt_sample_batch

        Qs = jnp.stack([random_qubo(rng, 5) for _ in range(3)])
        out = pt_sample_batch(jax.random.key(2), Qs, 64, num_sweeps=8, num_replicas=4)
        assert out.shape == (3, 64, 5)


class TestEdgeShapes:
    def test_single_read(self, rng):
        Q = random_qubo(rng, 4)
        s = sa_sample(jax.random.key(0), Q, 1, 8)
        assert s.shape == (1, 4)

    def test_single_variable_qubo(self):
        Q = jnp.asarray([[-3.0]])
        s = sa_sample(jax.random.key(0), Q, 64, 32)
        assert s.shape == (64, 1)
        assert s.mean() > 0.9  # negative bias -> on

    def test_batch_of_one(self, rng):
        Q = random_qubo(rng, 5)[None]
        out = sa_sample_batch(jax.random.key(1), Q, 16, 8)
        assert out.shape == (1, 16, 5)
