"""Flat Disc_QBM: QUBO builders vs hand-computed matrices, moment estimation
vs naive per-example loops, and a small end-to-end training run that must
learn a separable toy problem (SURVEY.md §4 test pyramid)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.models.dqbm import (
    DiscQBM,
    DQBMParams,
    clamped_moments,
    clamped_qubo,
    init_params,
    unclamped_moments,
    unclamped_qubo,
)
from qbmx.samplers.api import GibbsSampler
from qbmx.train.loop import train_model


def small_params(rng, D=4, H=3, O=1, restricted=False):
    u = lambda shape: rng.uniform(-1, 1, shape).astype("float32")
    return DQBMParams(
        w_vh=jnp.asarray(u((O + D, H))),
        w_vo=jnp.asarray(u((D, O))),
        w_oo=jnp.triu(jnp.asarray(u((O, O))), k=1),
        b_h=jnp.asarray(u((H,))),
        b_o=jnp.asarray(u((O,))),
        w_hh=jnp.triu(jnp.asarray(u((H, H))), k=1) if not restricted else jnp.zeros((H, H)),
    )


class TestQuboBuilders:
    def test_clamped_matches_reference_structure(self, rng):
        """Clamped H×H QUBO: diag = b_h + concat(label, x)·W_vh, upper = W_hh,
        all / beta_eff (reference ``create_qubo_matrix_from`` clamped branch,
        ``src/model/faster_dqbm.py:233-246``)."""
        D, H, O = 4, 3, 1
        p = small_params(rng, D, H, O)
        x = rng.uniform(0, 1, D).astype("float32")
        y = np.asarray([1.0], dtype="float32")
        beta = 2.0
        Q = np.asarray(clamped_qubo(p, jnp.asarray(x), jnp.asarray(y), beta))

        v = np.concatenate([y, x])
        expected = np.diag(np.asarray(p.b_h) + v @ np.asarray(p.w_vh)) + np.triu(
            np.asarray(p.w_hh), k=1
        )
        expected = expected / beta
        assert Q.shape == (H, H)
        assert np.allclose(Q, expected, atol=1e-5)

    def test_unclamped_matches_reference_structure(self, rng):
        """Unclamped (O+H)² QUBO layout (reference ``create_qubo_matrix_from``
        unclamped branch, ``src/model/faster_dqbm.py:255-284``)."""
        D, H, O = 5, 3, 2
        p = small_params(rng, D, H, O)
        x = rng.uniform(0, 1, D).astype("float32")
        beta = 1.5
        Q = np.asarray(unclamped_qubo(p, jnp.asarray(x), beta))

        n = O + H
        expected = np.zeros((n, n))
        expected[:O, :O] += np.triu(np.asarray(p.w_oo), k=1)
        expected[:O, O:] += np.asarray(p.w_vh)[:O]
        expected[O:, O:] += np.triu(np.asarray(p.w_hh), k=1)
        diag = np.concatenate(
            [
                np.asarray(p.b_o) + x @ np.asarray(p.w_vo),
                np.asarray(p.b_h) + x @ np.asarray(p.w_vh)[O:],
            ]
        )
        expected += np.diag(diag)
        expected /= beta
        assert np.allclose(Q, expected, atol=1e-5)

    def test_restricted_clamped_is_diagonal(self, rng):
        p = small_params(rng, 4, 3, 1, restricted=True)
        Q = np.asarray(
            clamped_qubo(p, jnp.asarray(rng.uniform(0, 1, 4), dtype=jnp.float32),
                         jnp.asarray([0.0]), 1.0)
        )
        assert np.allclose(Q - np.diag(np.diag(Q)), 0.0)



    def test_structured_builders_match_dense(self, rng):
        """shared + diag(fields) must equal the dense per-example builders
        EXACTLY — the contract the sampler group path (sa_lane) relies on."""
        import numpy as np
        from qbmx.models.dqbm import (
            clamped_fields,
            clamped_qubo_batch,
            clamped_qubo_shared,
            unclamped_fields,
            unclamped_qubo_batch,
            unclamped_qubo_shared,
        )

        params = small_params(rng, D=5, H=4, O=3)
        B, beta_eff = 6, 2.5
        x = jnp.asarray(rng.uniform(0, 1, (B, 5)).astype("float32"))
        y = jnp.asarray(np.eye(3, dtype="float32")[rng.integers(0, 3, B)])

        Qc = clamped_qubo_batch(params, x, y, beta_eff)
        Qc_s = clamped_qubo_shared(params, beta_eff)
        hc = clamped_fields(params, x, y, beta_eff)
        np.testing.assert_allclose(
            np.asarray(Qc), np.asarray(Qc_s[None] + jax.vmap(jnp.diagflat)(hc)),
            rtol=0, atol=1e-6)

        Qu = unclamped_qubo_batch(params, x, beta_eff)
        Qu_s = unclamped_qubo_shared(params, beta_eff)
        hu = unclamped_fields(params, x, beta_eff)
        np.testing.assert_allclose(
            np.asarray(Qu), np.asarray(Qu_s[None] + jax.vmap(jnp.diagflat)(hu)),
            rtol=0, atol=1e-6)

class TestMoments:
    def test_clamped_vs_naive(self, rng):
        """Vectorized clamped stats == the reference's correct per-example
        estimator (``get_average_configuration``,
        ``src/model/faster_dqbm.py:688-752``) with the label-first row order
        of the weight matrix."""
        B, R, D, H, O = 3, 16, 4, 3, 1
        s_h = jnp.asarray(rng.integers(0, 2, (B, R, H)), dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (B, D)), dtype=jnp.float32)
        yv = jnp.asarray(rng.integers(0, 2, (B, O)), dtype=jnp.float32)
        m = clamped_moments(s_h, x, yv)

        for b in range(B):
            S = np.asarray(s_h[b])
            Eh = S.mean(axis=0)
            v = np.concatenate([np.asarray(yv[b]), np.asarray(x[b])])
            assert np.allclose(m.b_h[b], Eh, atol=1e-5)
            assert np.allclose(m.b_o[b], yv[b])
            assert np.allclose(m.w_vh[b], np.outer(v, Eh), atol=1e-5)
            assert np.allclose(m.w_vo[b], np.outer(np.asarray(x[b]), np.asarray(yv[b])), atol=1e-5)
            Ehh = S.T @ S / R
            assert np.allclose(m.w_hh[b], np.triu(Ehh, k=1), atol=1e-5)

    def test_unclamped_vs_naive(self, rng):
        B, R, D, H, O = 2, 32, 4, 3, 2
        s = jnp.asarray(rng.integers(0, 2, (B, R, O + H)), dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (B, D)), dtype=jnp.float32)
        m = unclamped_moments(s, x, O)

        for b in range(B):
            S = np.asarray(s[b])
            y_s, h_s = S[:, :O], S[:, O:]
            assert np.allclose(m.b_o[b], y_s.mean(axis=0), atol=1e-5)
            assert np.allclose(m.b_h[b], h_s.mean(axis=0), atol=1e-5)
            # label rows carry the sampled pair statistic E[y_o h_j]
            assert np.allclose(m.w_vh[b][:O], y_s.T @ h_s / R, atol=1e-5)
            assert np.allclose(
                m.w_vh[b][O:], np.outer(np.asarray(x[b]), h_s.mean(axis=0)), atol=1e-5
            )
            assert np.allclose(m.w_oo[b], np.triu(y_s.T @ y_s / R, k=1), atol=1e-5)


class TestGradientSanity:
    def test_gradient_matches_exact_likelihood_direction(self, rng):
        """The clamped−unclamped moment diff must equal the true gradient of
        −log p(y|x) of the Boltzmann machine when samples are exact.  Verified
        numerically: update with exact-oracle samples decreases exact NLL."""
        from qbmx.samplers.api import ExactSampler

        D, H = 3, 2
        model = DiscQBM(
            dim_input=D, n_hidden_nodes=H, seed=0, sample_count=512,
            beta_eff=1.0, restricted=False, sampler=ExactSampler(),
        )
        rngl = np.random.default_rng(1)
        x = rngl.uniform(0, 1, (8, D)).astype("float32")
        w_true = rngl.uniform(-1, 1, D)
        y = (x @ w_true > np.median(x @ w_true)).astype("float32")

        nlls = []
        for _ in range(15):
            _, nll = model.train_for_one_iteration(x, y, learning_rate=0.4)
            nlls.append(nll)
        assert nlls[-1] < nlls[0]

    def test_restricted_keeps_whh_zero(self, rng):
        from qbmx.samplers.api import ExactSampler

        model = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=64,
                        restricted=True, sampler=ExactSampler())
        x = rng.uniform(0, 1, (4, 3)).astype("float32")
        y = np.asarray([0, 1, 0, 1], dtype="float32")
        model.train_for_one_iteration(x, y, 0.1)
        assert np.allclose(np.asarray(model.params.w_hh), 0.0)


class TestEndToEnd:
    def test_learns_toy_problem(self):
        """Small separable problem: training must push accuracy well above
        chance within a few epochs (statistical parity philosophy: final
        metrics, not bitwise streams)."""
        rngl = np.random.default_rng(3)
        D = 6
        n = 60
        x = rngl.uniform(0, 1, (n, D)).astype("float32")
        w_true = np.asarray([2.0, -2.0, 1.5, -1.5, 1.0, -1.0])
        y = (x @ w_true > 0).astype("float32")

        model = DiscQBM(
            dim_input=D, n_hidden_nodes=3, seed=7, sample_count=128,
            anneal_steps=30, beta_eff=1.0, restricted=False,
            sampler=GibbsSampler(num_warmup=24),
        )
        history = train_model(
            model, x, y, x, y, batch_size=20, learning_rate=0.5, epochs=8,
            verbose=False,
        )
        assert max(history.acc_per_epoch) >= 0.75

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        model = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=16,
                        restricted=False)
        model.save_weights("ckpt", str(tmp_path))
        model2 = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=1, sample_count=16,
                         restricted=False)
        model2.load_savepoint(str(tmp_path / "ckpt.pkl"))
        for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(model2.params)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_load_reference_style_5tuple(self, tmp_path):
        """Restricted (5-tuple) reference checkpoints load too
        (``src/model/faster_dqbm.py:169-190``)."""
        import pickle

        D, H, O = 4, 3, 1
        rngl = np.random.default_rng(0)
        objs = [
            rngl.uniform(-1, 1, (O + D, H)),
            rngl.uniform(-1, 1, (D, O)),
            rngl.uniform(-1, 1, H),
            rngl.uniform(-1, 1, O),
            np.triu(rngl.uniform(-1, 1, (O, O)), k=1),
        ]
        path = tmp_path / "ref.pkl"
        with open(path, "wb") as f:
            pickle.dump(objs, f)
        model = DiscQBM(dim_input=D, n_hidden_nodes=H, seed=0, restricted=True,
                        load_path=str(path))
        assert np.allclose(np.asarray(model.params.w_vh), objs[0])
        assert np.allclose(np.asarray(model.params.w_hh), 0.0)

    def test_load_savepoint_rejects_mismatched_config(self, tmp_path):
        """A pickle from different hyperparameters must fail with a message
        naming the mismatch, not an opaque shape error inside the jitted
        step (ADVICE r4: reload scripts hardcoding hnodes/restricted)."""
        model = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, restricted=False)
        model.save_weights("ckpt", str(tmp_path))
        with pytest.raises(ValueError, match="n_hidden_nodes=5"):
            DiscQBM(dim_input=4, n_hidden_nodes=5, seed=0, restricted=False,
                    load_path=str(tmp_path / "ckpt.pkl"))
        # 6-tuple (fully connected) pickle into a restricted model
        with pytest.raises(ValueError, match="restricted"):
            DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, restricted=True,
                    load_path=str(tmp_path / "ckpt.pkl"))


class TestOneHotMulticlass:
    def test_three_class_one_hot_learns(self):
        """Multi-node one-hot labels (reference use_one_hot_encoding=True,
        src/model/faster_dqbm.py:77-81): 3-class synthetic task."""
        from qbmx.data.loaders import synthetic_images

        x, y = synthetic_images(90, shape=(4, 4), num_classes=3, seed=0)
        x = x.reshape(len(x), -1)
        m = DiscQBM(dim_input=16, num_classes=3, n_hidden_nodes=4, seed=1,
                    sample_count=128, use_one_hot_encoding=True,
                    sampler=GibbsSampler(num_warmup=16))
        h = train_model(m, x, y, x, y, batch_size=30, learning_rate=0.4,
                        epochs=8, class_titles=["0", "1", "2"], verbose=False)
        assert max(h.acc_per_epoch) >= 0.8


class TestEdgeCases:
    def test_single_hidden_node(self):
        """H=1 (the reference notes embedding bugs at one hidden node,
        src/model/faster_dqbm.py:876) — must train without special-casing."""
        rngl = np.random.default_rng(0)
        m = DiscQBM(dim_input=4, n_hidden_nodes=1, seed=0, sample_count=64,
                    sampler=GibbsSampler(num_warmup=8))
        x = rngl.uniform(0, 1, (8, 4)).astype("float32")
        y = rngl.integers(0, 2, 8).astype("float32")
        err, nll = m.train_for_one_iteration(x, y, 0.2)
        assert np.isfinite(nll)
        assert m.predict(x[0]) in (0, 1)

    def test_get_num_params(self):
        m = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=8)
        # w_vh (5,3) + w_vo (4,1) + w_oo (1,1) + b_h 3 + b_o 1 + w_hh (3,3)
        assert m.get_num_params() == 15 + 4 + 1 + 3 + 1 + 9

    def test_full_mnist_shapes_on_mesh(self):
        """BASELINE config 'Multi-chip: replicated Gibbs/SA chains with ICI
        allreduce of gradient stats, full MNIST': one sharded step at
        784-dim full-MNIST shapes on the virtual 8-device mesh."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from qbmx.parallel.mesh import make_dqbm_sharded_step, make_mesh

        mesh = make_mesh(dp=4, chains=2)
        m = DiscQBM(dim_input=784, n_hidden_nodes=8, seed=0, sample_count=64,
                    sampler=GibbsSampler(num_warmup=8))
        step = make_dqbm_sharded_step(m, mesh)
        rngl = np.random.default_rng(1)
        x = jnp.asarray(rngl.uniform(0, 1, (64, 784)), dtype=jnp.float32)
        y = jnp.asarray(rngl.integers(0, 2, 64), dtype=jnp.float32)
        mask = jnp.ones((64,), dtype=jnp.float32)
        new_params, nll, _ = step(m.params, x, y, mask, 0.1, jax.random.key(0))
        assert np.isfinite(float(nll))


class TestLinearShortcut:
    def test_shortcut_matches_sampled_ground_state(self):
        """Restricted clamped phase: the analytic diagonal ground state must
        match what cold SA converges to (reference solve_linear_qubo,
        src/model/faster_dqbm.py:41-54)."""
        rngl = np.random.default_rng(2)
        x = rngl.uniform(0, 1, (6, 4)).astype("float32")
        y = rngl.integers(0, 2, 6).astype("float32")
        m1 = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=64,
                     restricted=True, use_linear_shortcut=True,
                     sampler=GibbsSampler(num_warmup=8))
        m2 = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=64,
                     restricted=True, use_linear_shortcut=False,
                     sampler=GibbsSampler(num_warmup=8))
        e1, n1 = m1.train_for_one_iteration(x, y, 0.2)
        e2, n2 = m2.train_for_one_iteration(x, y, 0.2)
        # unclamped phases share statistics; clamped analytic vs sampled must
        # produce nearby updates (Gibbs at beta=1 is softer than the ground
        # state, so compare loosely)
        a = np.asarray(m1.params.b_h)
        b = np.asarray(m2.params.b_h)
        assert np.allclose(a, b, atol=0.25)

    def test_shortcut_ignored_when_not_restricted(self):
        m = DiscQBM(dim_input=4, n_hidden_nodes=3, seed=0, sample_count=8,
                    restricted=False, use_linear_shortcut=True)
        assert m.use_linear_shortcut is False


class TestUnrolledEpoch:
    """Pallas-routed samplers can't scan on axon; the unrolled-segment epoch
    path (VERDICT r1 #5) must deliver the same training semantics in a few
    jitted launches."""

    def _model(self):
        from qbmx.samplers.api import SASampler

        return DiscQBM(
            dim_input=4, n_hidden_nodes=2, seed=3, sample_count=16,
            restricted=False, sampler=SASampler(num_sweeps=8, use_pallas=False),
        )

    def test_unrolled_segments_cover_epoch(self, monkeypatch):
        m = self._model()
        monkeypatch.setattr(DiscQBM, "supports_epoch_scan",
                            lambda self, batch_size=None: False)
        monkeypatch.setattr(DiscQBM, "EPOCH_UNROLL_SEGMENT", 2)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (13, 4)).astype("float32")  # nb=4 (ragged tail)
        y = (rng.uniform(size=13) < 0.5).astype("float32")
        nlls, errs = m.train_epoch(x, y, batch_size=4, learning_rate=0.1)
        assert nlls.shape == (4,) and errs.shape == (4,)
        assert np.all(np.isfinite(nlls))
        assert set(m._epoch_unrolled) == {2}  # 2+2 segments, one compile

    def test_unrolled_is_deterministic_per_seed(self, monkeypatch):
        monkeypatch.setattr(DiscQBM, "supports_epoch_scan",
                            lambda self, batch_size=None: False)
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (8, 4)).astype("float32")
        y = (rng.uniform(size=8) < 0.5).astype("float32")
        runs = []
        for _ in range(2):
            m = self._model()
            m.train_epoch(x, y, batch_size=4, learning_rate=0.1)
            runs.append(np.asarray(m.params.b_h))
        np.testing.assert_array_equal(runs[0], runs[1])

    def test_loop_uses_whole_epoch_jit_predicate(self, monkeypatch):
        from qbmx.train.loop import train_model

        m = self._model()
        monkeypatch.setattr(DiscQBM, "supports_epoch_scan",
                            lambda self, batch_size=None: False)
        calls = {"n": 0}
        orig = DiscQBM.train_epoch

        def spy(self, *a, **k):
            calls["n"] += 1
            return orig(self, *a, **k)

        monkeypatch.setattr(DiscQBM, "train_epoch", spy)
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (8, 4)).astype("float32")
        y = (rng.uniform(size=8) < 0.5).astype("float32")
        train_model(m, x, y, batch_size=4, learning_rate=0.1, epochs=2, verbose=False)
        assert calls["n"] == 2  # whole-epoch path taken despite no-scan


class TestDeviceCacheKeys:
    def test_recycled_id_cannot_hit_cache(self):
        """Weakref-keyed caches: a dead host array whose id is recycled by
        a new same-length array must MISS (round-2 review finding)."""
        m = DiscQBM(dim_input=4, n_hidden_nodes=2, seed=0, sample_count=8)
        a = np.zeros((8, 4), dtype="float32")
        m._cache_store("_probe", (a,), 42, "value-for-a")
        assert m._cache_lookup("_probe", (a,), 42) == "value-for-a"
        old_id = id(a)
        del a
        candidates = [np.ones((8, 4), dtype="float32") for _ in range(64)]
        recycled = [b for b in candidates if id(b) == old_id]
        for b in candidates:
            assert m._cache_lookup("_probe", (b,), 42) is None
        # the id really does get recycled in practice (documents the hazard)
        assert recycled or True

    def test_training_two_datasets_uses_fresh_data(self):
        from qbmx.samplers.api import SASampler

        m = DiscQBM(dim_input=4, n_hidden_nodes=2, seed=0, sample_count=8,
                    sampler=SASampler(num_sweeps=4, use_pallas=False))
        rng = np.random.default_rng(0)

        def run_epoch():
            x = rng.uniform(0, 1, (8, 4)).astype("float32")
            y = (rng.uniform(size=8) < 0.5).astype("float32")
            m.train_epoch(x, y, batch_size=4, learning_rate=0.1)
            refs, extra, value = m._epoch_data  # (weakrefs, batch_size, batches)
            assert refs[0]() is x  # cache entry belongs to THIS dataset
            return np.asarray(value[0])  # cached device x-batches

        xb1 = run_epoch()
        xb2 = run_epoch()
        assert not np.array_equal(xb1, xb2)  # second dataset actually used


class TestGradClip:
    """Flag-gated global-norm gradient clipping (OFF by default)."""

    def _model(self, grad_clip, seed=3):
        from qbmx.samplers.api import ExactSampler

        return DiscQBM(dim_input=4, n_hidden_nodes=2, seed=seed, sample_count=64,
                       restricted=False, sampler=ExactSampler(),
                       grad_clip=grad_clip)

    def test_huge_clip_is_identity(self, rng):
        """A non-binding clip must not change the trajectory at all."""
        import jax

        x = rng.uniform(0, 1, (6, 4)).astype("float32")
        y = (rng.uniform(size=6) < 0.5).astype("float32")
        m0, m1 = self._model(0.0), self._model(1e9)
        for _ in range(3):
            m0.train_for_one_iteration(x, y, 0.2)
            m1.train_for_one_iteration(x, y, 0.2)
        for a, b in zip(jax.tree.leaves(m0.params), jax.tree.leaves(m1.params)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_clip_bounds_update_norm(self, rng):
        import jax

        x = rng.uniform(0, 1, (6, 4)).astype("float32")
        y = (rng.uniform(size=6) < 0.5).astype("float32")
        clip, lr = 0.01, 0.5
        m = self._model(clip)
        before = jax.tree.map(np.asarray, m.params)
        m.train_for_one_iteration(x, y, lr)
        sq = sum(
            float(np.sum((np.asarray(a) - b) ** 2))
            for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(before))
        )
        assert np.sqrt(sq) <= lr * clip * (1 + 1e-4)

    def test_cdqbm_clip_bounds_update_norm(self, rng):
        import jax

        from qbmx.models.cdqbm import CDQBM
        from qbmx.samplers.api import SASampler

        x = rng.uniform(0, 1, (4, 4, 4)).astype("float32")
        y = (rng.uniform(size=4) < 0.5).astype("float32")
        clip, lr = 0.01, 0.5
        m = CDQBM(image_shape=(4, 4), kernel_size=2, pooling_size=0,
                  sequential_layer_sizes=[2], seed=0, sample_count=16,
                  sampler=SASampler(num_sweeps=8, use_pallas=False),
                  grad_clip=clip)
        before = jax.tree.map(np.asarray, m.params)
        m.train_for_one_iteration(x, y, lr)
        sq = sum(
            float(np.sum((np.asarray(a) - b) ** 2))
            for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(before))
        )
        assert np.sqrt(sq) <= lr * clip * (1 + 1e-4)
