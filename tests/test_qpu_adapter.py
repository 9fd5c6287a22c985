"""QPUSampler adapter tests with a fake dimod-style sampler.

No Ocean SDK installed (nor wanted): the adapter is exercised through its
duck-typed surface (``sample_qubo`` → sampleset with ``record.sample`` +
``variables``), mirroring the reference's ``DWaveAdapter`` shape
(``src/qubo/sampler.py:35-51``) and its connection-retry behavior
(``src/model/faster_dqbm.py:361-369``).
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.samplers.qpu import QPUSampler, _ordered_samples, _qubo_dict


class FakeSampleSet:
    def __init__(self, samples, variables, qpu_us=123.0):
        self.record = types.SimpleNamespace(sample=np.asarray(samples))
        self.variables = list(variables)
        self.info = {"timing": {"qpu_access_time": qpu_us}}


class FakeDimodSampler:
    """Solves the QUBO exactly by enumeration — a stand-in 'QPU'."""

    def __init__(self, shuffle_vars=False, fail_times=0):
        self.shuffle_vars = shuffle_vars
        self.fail_times = fail_times
        self.calls = 0

    def sample_qubo(self, qdict, num_reads=1, **_):
        self.calls += 1
        if self.fail_times > 0:
            self.fail_times -= 1
            raise ConnectionResetError("flaky network")
        n = max(max(i, j) for i, j in qdict) + 1
        Q = np.zeros((n, n))
        for (i, j), v in qdict.items():
            Q[i, j] += v
        best, best_e = None, np.inf
        for m in range(2**n):
            s = np.array([(m >> k) & 1 for k in range(n)], dtype=float)
            e = s @ np.triu(Q, 1) @ s + np.diag(Q) @ s
            if e < best_e:
                best, best_e = s, e
        samples = np.tile(best, (num_reads, 1))
        variables = list(range(n))
        if self.shuffle_vars:  # permute reporting order like real samplesets can
            perm = np.asarray([1, 0] + list(range(2, n)))
            samples = samples[:, perm]
            variables = [variables[p] for p in perm]
        return FakeSampleSet(samples, variables)


def test_qubo_dict_roundtrip():
    Q = np.triu(np.arange(9, dtype=np.float32).reshape(3, 3))
    d = _qubo_dict(Q)
    assert d[(0, 1)] == 1.0 and d[(1, 2)] == 5.0 and d[(0, 0)] == 0.0
    assert all(i <= j for i, j in d)


def test_qubo_dict_folds_lower_triangle():
    """Symmetric input must sample the same energies as split_qubo's
    both-triangle summing (dimod convention, qbmx/core/qubo.py)."""
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (4, 4)).astype(np.float32)
    d = _qubo_dict(A)
    for i in range(4):
        for j in range(i + 1, 4):
            expect = float(A[i, j] + A[j, i])
            got = d.get((i, j), 0.0)
            assert abs(got - expect) < 1e-6, (i, j, got, expect)
        assert abs(d.get((i, i), 0.0) - float(A[i, i])) < 1e-6


def test_sample_batch_orders_variables_and_solves():
    # ground state of diag([-1, 2, -3]) is [1, 0, 1]
    Q = jnp.asarray(np.diag([-1.0, 2.0, -3.0]).astype(np.float32))[None]
    for shuffle in (False, True):
        adapter = QPUSampler(FakeDimodSampler(shuffle_vars=shuffle))
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 5))
        assert out.shape == (1, 5, 3)
        np.testing.assert_array_equal(out[0, 0], [1.0, 0.0, 1.0])


def test_connection_retry_with_refresh():
    fresh = FakeDimodSampler()
    adapter = QPUSampler(FakeDimodSampler(fail_times=1), refresh=lambda: fresh)
    Q = jnp.asarray(np.diag([-1.0, 1.0]).astype(np.float32))[None]
    out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 3))
    np.testing.assert_array_equal(out[0, 0], [1.0, 0.0])
    assert fresh.calls == 1  # the retry went through the refreshed sampler


def test_connection_failure_twice_propagates():
    adapter = QPUSampler(FakeDimodSampler(fail_times=2),
                         refresh=lambda: FakeDimodSampler(fail_times=5))
    Q = jnp.asarray(np.diag([-1.0]).astype(np.float32))[None]
    with pytest.raises(ConnectionResetError):
        adapter.sample_batch(jax.random.key(0), Q, 1)


def test_qpu_time_accumulates():
    adapter = QPUSampler(FakeDimodSampler())
    Q = jnp.asarray(np.diag([-1.0, 1.0]).astype(np.float32))
    adapter.sample_batch(jax.random.key(0), jnp.stack([Q, Q]), 2)
    assert adapter.qpu_time_used == pytest.approx(246.0)


def test_get_sampler_dwave_name_needs_ocean():
    from qbmx.samplers.api import get_sampler

    with pytest.raises(NotImplementedError, match="Ocean"):
        get_sampler("Advantage_system4.1")


def test_rejects_tracers():
    adapter = QPUSampler(FakeDimodSampler())

    def f(Q):
        return adapter.sample_batch(jax.random.key(0), Q, 1)

    with pytest.raises(RuntimeError, match="jit"):
        jax.jit(f)(jnp.zeros((1, 2, 2)))


def test_ordered_samples_handles_subset_order():
    ss = FakeSampleSet([[1, 0, 1]], variables=[2, 0, 1])
    out = _ordered_samples(ss, 3)
    np.testing.assert_array_equal(out[0], [0.0, 1.0, 1.0])


def test_qpu_sampler_trains_eagerly_end_to_end():
    """Models build EAGER steps for jit-unsafe samplers, so the QPU adapter
    actually trains (round-2 review finding: the jitted step made every
    training path raise)."""
    from qbmx.models.dqbm import DiscQBM
    from qbmx.train.loop import train_model

    adapter = QPUSampler(FakeDimodSampler())
    m = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=4,
                restricted=True, sampler=adapter)
    assert not m.supports_whole_epoch_jit() and not m.supports_epoch_scan()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (6, 3)).astype("float32")
    y = np.asarray([0, 1] * 3, dtype="float32")
    h = train_model(m, x, y, batch_size=3, learning_rate=0.1, epochs=1,
                    verbose=False)
    assert len(h.nll_per_batch) == 2 and np.isfinite(h.nll_per_batch).all()
    preds, _ = m.predict_batch(x)
    assert preds.shape == (6,)


def test_shard_model_rejects_host_bound_sampler():
    import jax
    import pytest as _pytest

    from qbmx.models.dqbm import DiscQBM
    from qbmx.parallel.mesh import make_mesh, shard_model

    m = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=4,
                sampler=QPUSampler(FakeDimodSampler()))
    mesh = make_mesh(dp=len(jax.devices()), chains=1)
    with _pytest.raises(TypeError, match="jit_safe"):
        shard_model(m, mesh)


class PatternSampler:
    """Returns per-(read, replica) distinguishable constant blocks so the
    de-interleave order is observable: read r, replica c → block filled
    with ``(r * k + c) % 2``."""

    def __init__(self, n):
        self.n = n
        self.reads_seen = []

    def sample_qubo(self, qdict, num_reads=1, **_):
        nv = max(max(i, j) for i, j in qdict) + 1
        k = nv // self.n
        self.reads_seen.append(num_reads)
        rows = [
            sum(([float((r * k + c) % 2)] * self.n for c in range(k)), [])
            for r in range(num_reads)
        ]
        return FakeSampleSet(rows, list(range(nv)), qpu_us=0.0)


class BoltzmannEnumSampler:
    """Exact-Boltzmann sampler by full enumeration (<= ~12 vars) — the
    statistical ground truth for both the single-copy and packed paths
    (independent block-diagonal replicas factorize exactly)."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)

    def sample_qubo(self, qdict, num_reads=1, **_):
        nv = max(max(i, j) for i, j in qdict) + 1
        Q = np.zeros((nv, nv))
        for (i, j), v in qdict.items():
            Q[i, j] += v
        states = np.array(
            [[(m >> b) & 1 for b in range(nv)] for m in range(2**nv)],
            dtype=float)
        E = np.einsum("si,ij,sj->s", states, np.triu(Q, 1), states) + states @ np.diag(Q)
        p = np.exp(-(E - E.min()))
        p /= p.sum()
        idx = self.rng.choice(len(states), size=num_reads, p=p)
        return FakeSampleSet(states[idx], list(range(nv)), qpu_us=0.0)


class TestReplicatedCopies:
    """VERDICT r3 Missing #2: the reference's parallel-QA replication
    (duplicate_and_concatenate_qubo / split_and_rename_dicts,
    src/model/faster_dqbm.py:287-297, 399-407, 435-501) on the adapter."""

    def test_packs_block_diagonal_and_accounts_reads(self):
        fake = FakeDimodSampler()
        seen = {}
        orig = fake.sample_qubo

        def spy(qdict, num_reads=1, **kw):
            seen["qdict"], seen["reads"] = dict(qdict), num_reads
            return orig(qdict, num_reads=num_reads, **kw)

        fake.sample_qubo = spy
        adapter = QPUSampler(fake, copies=3)
        Q = jnp.asarray(np.diag([-1.0, 2.0, -3.0]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 5))
        assert out.shape == (1, 5, 3)
        np.testing.assert_array_equal(out[0], np.tile([1.0, 0.0, 1.0], (5, 1)))
        # ceil(5/3) = 2 hardware reads for 5 samples, ONE roundtrip
        assert seen["reads"] == 2 and fake.calls == 1
        assert adapter.reads_requested == 2 and adapter.samples_returned == 5
        # block-diagonal: 9 variables, zero cross-replica couplings
        assert max(max(i, j) for i, j in seen["qdict"]) == 8
        assert all(i // 3 == j // 3 for i, j in seen["qdict"])
        # every replica carries the same diagonal
        for c in range(3):
            for v, expect in enumerate([-1.0, 2.0, -3.0]):
                assert seen["qdict"][(c * 3 + v, c * 3 + v)] == expect

    def test_deinterleave_order_read_major(self):
        n, k = 2, 2
        fake = PatternSampler(n)
        adapter = QPUSampler(fake, copies=k)
        Q = jnp.zeros((1, n, n), jnp.float32)
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 4))[0]
        # sample r*k + c == read r's replica c
        np.testing.assert_array_equal(out[:, 0], [0.0, 1.0, 0.0, 1.0])
        assert fake.reads_seen == [2]

    def test_copies_capped_by_reads(self):
        fake = FakeDimodSampler()
        adapter = QPUSampler(fake, copies=8)
        Q = jnp.asarray(np.diag([-1.0, 1.0]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 3))
        assert out.shape == (1, 3, 2)
        assert adapter.reads_requested == 1  # 3 copies in one anneal

    def test_statistics_match_single_copy_path(self):
        """De-interleaved replica samples must match the single-copy path's
        distribution (independent blocks factorize exactly)."""
        Q = jnp.asarray(np.array([[-0.8, 0.6], [0.0, 0.4]], np.float32))[None]
        reads = 4000
        single = QPUSampler(BoltzmannEnumSampler(seed=1))
        packed = QPUSampler(BoltzmannEnumSampler(seed=2), copies=5)
        m1 = np.asarray(single.sample_batch(jax.random.key(0), Q, reads))[0].mean(axis=0)
        m2 = np.asarray(packed.sample_batch(jax.random.key(0), Q, reads))[0].mean(axis=0)
        np.testing.assert_allclose(m1, m2, atol=0.05)
        assert packed.reads_requested == 800 and single.reads_requested == reads

    def test_invalid_copies_rejected(self):
        with pytest.raises(ValueError, match="copies"):
            QPUSampler(FakeDimodSampler(), copies=0)


class TestCopiesCLIReachability:
    """The reference reaches parallel QA straight from its CLIs (a D-Wave
    solver string routes training through ``get_parallel_qa_samples``,
    ``src/model/faster_dqbm.py:674-679``); qbmx's equivalent knob is
    ``--qpu_copies`` → ``sampler_kwargs={"copies": k}`` → the registry."""

    def test_parsers_accept_qpu_copies(self):
        from qbmx.cli import cdqbm_main, qbm_main

        for mod in (qbm_main, cdqbm_main):
            flags = mod.build_parser().parse_args(["--qpu_copies", "4"])
            assert flags.qpu_copies == 4
            assert mod.build_parser().parse_args([]).qpu_copies == 1

    def test_dqbm_threads_sampler_kwargs_to_registry(self, monkeypatch):
        import qbmx.models.dqbm as dqbm_mod

        seen = {}

        def recorder(solver, num_sweeps=1000, **kw):
            seen.update(solver=solver, num_sweeps=num_sweeps, **kw)
            return QPUSampler(FakeDimodSampler(), copies=kw.get("copies", 1))

        monkeypatch.setattr(dqbm_mod, "get_sampler", recorder)
        m = dqbm_mod.DiscQBM(dim_input=4, n_hidden_nodes=2, anneal_steps=7,
                             solver="SA", sampler_kwargs={"copies": 3})
        assert seen == {"solver": "SA", "num_sweeps": 7, "copies": 3}
        assert m.sampler.copies == 3

    def test_cdqbm_threads_sampler_kwargs_to_registry(self, monkeypatch):
        import qbmx.models.cdqbm as cdqbm_mod

        seen = {}

        def recorder(solver, num_sweeps=1000, **kw):
            seen.update(solver=solver, num_sweeps=num_sweeps, **kw)
            return QPUSampler(FakeDimodSampler(), copies=kw.get("copies", 1))

        monkeypatch.setattr(cdqbm_mod, "get_sampler", recorder)
        m = cdqbm_mod.CDQBM(image_shape=(6, 6), kernel_size=3, stride=3,
                            anneal=9, sampler_kwargs={"copies": 2})
        assert seen == {"solver": "SA", "num_sweeps": 9, "copies": 2}
        assert m.sampler.copies == 2


class FakeHistogramSampler:
    """Aggregates identical reads into unique rows + ``num_occurrences`` —
    real annealers' DEFAULT ``answer_mode='histogram'`` (the duck-typed
    fakes above return one row per read, which a raw-mode sampleset does but
    a production D-Wave call does not)."""

    def __init__(self, p=0.5, seed=0):
        self.rng = np.random.default_rng(seed)
        self.p = p
        self.last_raw = None

    def sample_qubo(self, qdict, num_reads=1, **_):
        n = max(max(i, j) for i, j in qdict) + 1
        raw = (self.rng.random((num_reads, n)) < self.p).astype(float)
        self.last_raw = raw
        uniq, counts = np.unique(raw, axis=0, return_counts=True)
        ss = FakeSampleSet(uniq, list(range(n)))
        ss.record.num_occurrences = counts
        return ss


class TestHistogramAnswerMode:
    """Consuming aggregated samplesets as-is would under-deliver reads AND
    bias every moment estimate toward rare configurations (each unique row
    counted once regardless of multiplicity); _ordered_samples expands rows
    by num_occurrences instead."""

    def test_ordered_samples_expands_occurrences(self):
        ss = FakeSampleSet([[0.0, 1.0], [1.0, 0.0]], [0, 1])
        ss.record.num_occurrences = np.asarray([3, 1])
        out = _ordered_samples(ss, 2)
        assert out.shape == (4, 2)
        np.testing.assert_array_equal(
            out, [[0, 1], [0, 1], [0, 1], [1, 0]])

    def test_single_copy_returns_every_read_with_multiplicity(self):
        fake = FakeHistogramSampler(p=0.5, seed=3)
        adapter = QPUSampler(fake)
        Q = jnp.asarray(np.diag([0.1, -0.2, 0.3]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 64))
        assert out.shape == (1, 64, 3)
        # exact multiset equality with the pre-aggregation draws
        got = np.sort(out[0].view([("", out.dtype)] * 3).ravel())
        want = np.sort(
            fake.last_raw.astype(out.dtype).view([("", out.dtype)] * 3).ravel())
        np.testing.assert_array_equal(got, want)

    def test_copies_deinterleave_survives_aggregation(self):
        # p=0 collapses every read to the all-zero row: the histogram has ONE
        # unique row whose count is the full read budget — without occurrence
        # expansion the (reads, k, n) de-interleave reshape cannot even run
        fake = FakeHistogramSampler(p=0.0)
        adapter = QPUSampler(fake, copies=4)
        Q = jnp.asarray(np.diag([0.1, 0.2, 0.3]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 8))
        assert out.shape == (1, 8, 3)
        np.testing.assert_array_equal(out, np.zeros((1, 8, 3)))
        assert adapter.reads_requested == 2  # ceil(8 / 4)
        assert adapter.samples_returned == 8
