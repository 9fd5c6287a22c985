"""Discriminative RBM: exact-gradient equivalence, CD-k sanity, end-to-end
learning on a toy problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.models.rbm import (
    ClassificationRBM,
    RBMParams,
    cd_stats,
    class_logits,
    discriminative_nll,
    init_params,
    make_train_step,
    predict_proba,
)


def toy_data(rng, n=120, D=10):
    x = (rng.uniform(0, 1, (n, D)) > 0.5).astype("float32")
    w = rng.normal(size=D)
    y = (x @ w > np.median(x @ w)).astype("int32")
    return x, y


class TestExactDiscriminative:
    def test_class_probs_match_bruteforce(self, rng):
        """p(y|x) from the softplus closed form equals brute-force
        marginalization over all hidden configurations."""
        D, H, C = 4, 3, 2
        params = init_params(jax.random.key(0), D, H, C)
        params = RBMParams(
            weights=jnp.asarray(rng.normal(size=(D, H)), dtype=jnp.float32),
            visible_bias=jnp.asarray(rng.normal(size=D), dtype=jnp.float32),
            hidden_bias=jnp.asarray(rng.normal(size=H), dtype=jnp.float32),
            class_bias=jnp.asarray(rng.normal(size=C), dtype=jnp.float32),
            class_weights=jnp.asarray(rng.normal(size=(C, H)), dtype=jnp.float32),
        )
        x = jnp.asarray(rng.integers(0, 2, (5, D)), dtype=jnp.float32)
        probs = np.asarray(predict_proba(params, x))

        # brute force: p(y|x) ∝ Σ_h exp(-E(x,h,y)) with
        # -E = x·W·h + c·h + d_y + h·U_y  (visible bias cancels in y-posterior)
        H_states = np.asarray([[int(b) for b in f"{i:0{H}b}"] for i in range(2**H)], dtype=float)
        W = np.asarray(params.weights)
        c = np.asarray(params.hidden_bias)
        d = np.asarray(params.class_bias)
        U = np.asarray(params.class_weights)
        for i in range(x.shape[0]):
            xi = np.asarray(x[i])
            un = np.zeros(C)
            for yv in range(C):
                for h in H_states:
                    un[yv] += np.exp(xi @ W @ h + c @ h + d[yv] + U[yv] @ h)
            un /= un.sum()
            assert np.allclose(probs[i], un, rtol=1e-4, atol=1e-5)

    def test_exact_gradient_matches_finite_difference(self, rng):
        D, H, C = 3, 2, 2
        params = init_params(jax.random.key(1), D, H, C)
        x = jnp.asarray(rng.integers(0, 2, (6, D)), dtype=jnp.float32)
        y = jnp.asarray(rng.integers(0, C, 6), dtype=jnp.int32)
        grad = jax.grad(discriminative_nll)(params, x, y)

        eps = 1e-3
        w = np.asarray(params.weights).copy()
        w_fd = np.zeros_like(w)
        for i in range(D):
            for j in range(H):
                wp, wm = w.copy(), w.copy()
                wp[i, j] += eps
                wm[i, j] -= eps
                pp = discriminative_nll(
                    RBMParams(jnp.asarray(wp), params.visible_bias, params.hidden_bias,
                              params.class_bias, params.class_weights), x, y)
                pm = discriminative_nll(
                    RBMParams(jnp.asarray(wm), params.visible_bias, params.hidden_bias,
                              params.class_bias, params.class_weights), x, y)
                w_fd[i, j] = (float(pp) - float(pm)) / (2 * eps)
        assert np.allclose(np.asarray(grad.weights), w_fd, atol=2e-3)

    def test_visible_bias_untouched_by_discriminative(self, rng):
        """Reference sets visible_bias_grad = 0 in discriminative training
        (``src/ClassificationRBM.py:140``); jax.grad gives the same for free."""
        params = init_params(jax.random.key(2), 4, 3, 2)
        x = jnp.asarray(rng.integers(0, 2, (5, 4)), dtype=jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, 5), dtype=jnp.int32)
        grad = jax.grad(discriminative_nll)(params, x, y)
        assert np.allclose(np.asarray(grad.visible_bias), 0.0)


class TestCD:
    def test_cd_stats_shapes_and_ranges(self, rng):
        D, H, C, B = 6, 4, 2, 8
        params = init_params(jax.random.key(3), D, H, C)
        v = jnp.asarray(rng.integers(0, 2, (B, D)), dtype=jnp.float32)
        y = jax.nn.one_hot(jnp.asarray(rng.integers(0, C, B)), C)
        pos, neg, (vk, yk), recon = cd_stats(params, jax.random.key(4), v, y, k=2)
        assert pos.weights.shape == (D, H) and neg.weights.shape == (D, H)
        # non-persistent CD ends with a mean-field update: the final visible
        # state is a probability in [0, 1], not a binary sample
        assert vk.shape == (B, D) and recon.shape == (B, D)
        assert np.all(np.asarray(vk) >= 0) and np.all(np.asarray(vk) <= 1)
        assert np.allclose(np.asarray(yk).sum(axis=1), 1.0, atol=1e-5)
        assert np.all(np.asarray(pos.hidden_bias) >= 0) and np.all(np.asarray(pos.hidden_bias) <= 1)

    def test_cd_stats_persistent_chain_is_binary(self, rng):
        """PCD must carry BINARY fantasy particles (the classical chain)."""
        D, H, C, B = 6, 4, 2, 8
        params = init_params(jax.random.key(3), D, H, C)
        v = jnp.asarray(rng.integers(0, 2, (B, D)), dtype=jnp.float32)
        y = jax.nn.one_hot(jnp.asarray(rng.integers(0, C, B)), C)
        pos, neg, (vk, yk), _ = cd_stats(params, jax.random.key(4), v, y, k=2,
                                         persistent=True)
        assert set(np.unique(np.asarray(vk))) <= {0.0, 1.0}
        assert set(np.unique(np.asarray(yk))) <= {0.0, 1.0}

    def test_generative_training_reconstructs(self, rng):
        """CD-1 on a two-mode dataset should lower reconstruction error."""
        D = 8
        modes = np.asarray([[1, 1, 1, 1, 0, 0, 0, 0], [0, 0, 0, 0, 1, 1, 1, 1]], dtype="float32")
        idx = rng.integers(0, 2, 200)
        x = jnp.asarray(modes[idx])
        y = jnp.asarray(idx, dtype=jnp.int32)
        step = make_train_step(2, method="generative", cd_k=1)
        params = init_params(jax.random.key(5), D, 6, 2)
        key = jax.random.key(6)
        first = None
        for i in range(60):
            key, k = jax.random.split(key)
            params, loss = step(params, k, x, y, 0.2)
            if i == 0:
                first = float(loss)
        assert float(loss) < first


class TestEndToEnd:
    def test_learns_toy_problem(self, rng):
        x, y = toy_data(rng)
        rbm = ClassificationRBM(num_visible=10, num_hidden=8, k=1, num_classes=2,
                                learning_rate=0.2, seed=0)
        rbm.train_rbm(x, y, epochs=12, batch_size=10, test_x=x, test_y=y)
        assert max(rbm.acc_per_epoch_list) > 0.85

    def test_hybrid_mode_runs(self, rng):
        x, y = toy_data(rng, n=40)
        rbm = ClassificationRBM(num_visible=10, num_hidden=4, k=1, num_classes=2,
                                learning_rate=0.1, seed=0, method="hybrid",
                                generative_factor=0.01)
        loss_list, _, _ = rbm.train_rbm(x, y, epochs=2, batch_size=10)
        assert len(loss_list) == 2


class TestPCD:
    def test_pcd_runs_and_learns(self, rng):
        D = 8
        modes = np.asarray([[1, 1, 1, 1, 0, 0, 0, 0], [0, 0, 0, 0, 1, 1, 1, 1]],
                           dtype="float32")
        idx = rng.integers(0, 2, 120)
        x, y = modes[idx], idx.astype("int32")
        rbm = ClassificationRBM(num_visible=D, num_hidden=6, k=1, num_classes=2,
                                learning_rate=0.1, seed=0, method="pcd")
        loss_list, _, _ = rbm.train_rbm(x, y, epochs=6, batch_size=24)
        assert rbm._chain is not None  # fantasy particles persisted
        assert loss_list[-1] < loss_list[0]


class TestWarmStart:
    def test_warm_start_preserves_decision_function(self, rng):
        """After CD/exact pre-training, the mapped DQBM's exact p(y=1|x) must
        equal the RBM's (binary-node collapse is exact)."""
        import jax
        from qbmx.models.rbm import predict_proba
        from qbmx.models.warmstart import warm_start_dqbm
        from qbmx.samplers.api import ExactSampler

        x, y = toy_data(rng, n=60, D=6)
        rbm = ClassificationRBM(num_visible=6, num_hidden=3, num_classes=2,
                                learning_rate=0.3, seed=1)
        rbm.train_rbm(x, y, epochs=5, batch_size=12)
        rbm_probs = np.asarray(predict_proba(rbm.params, jnp.asarray(x[:10])))

        model = warm_start_dqbm(rbm, seed=0, sample_count=4096,
                                sampler=ExactSampler())
        _, qbm_probs = model.predict_batch(x[:10])
        # sampled marginals track the exact RBM posterior
        assert np.allclose(qbm_probs[:, 1], rbm_probs[:, 1], atol=0.06)

    def test_warm_start_then_sampled_training_improves(self, rng):
        from qbmx.models.warmstart import warm_start_dqbm
        from qbmx.samplers.api import GibbsSampler

        x, y = toy_data(rng, n=60, D=6)
        rbm = ClassificationRBM(num_visible=6, num_hidden=3, num_classes=2,
                                learning_rate=0.3, seed=1)
        rbm.train_rbm(x, y, epochs=2, batch_size=12)
        model = warm_start_dqbm(rbm, seed=0, sample_count=128,
                                sampler=GibbsSampler(num_warmup=16))
        preds0, _ = model.predict_batch(x)
        acc0 = (preds0 == y).mean()
        for _ in range(10):
            model.train_for_one_iteration(x, y.astype("float32"), 0.3)
        preds1, _ = model.predict_batch(x)
        assert (preds1 == y).mean() >= acc0 - 0.05  # no catastrophic forgetting


class TestBf16ComputeMode:
    def test_bf16_cd1_learns_like_f32(self):
        """The bench throughput mode (compute_dtype=bfloat16) must train to
        comparable accuracy on a small separable task."""
        import jax
        import jax.numpy as jnp

        from qbmx.models.rbm import (
            init_params, make_epoch_scan, make_train_step, predict_proba,
        )

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 1, (2, 16))
        y = rng.integers(0, 2, 256)
        x = ((0.7 * base[y] + 0.3 * rng.uniform(0, 1, (256, 16))) > 0.5).astype("float32")
        xb = jnp.asarray(x.reshape(8, 32, 16))
        yb = jnp.asarray(y.reshape(8, 32), jnp.int32)
        accs = {}
        for dt in (jnp.float32, jnp.bfloat16):
            step = make_train_step(num_classes=2, method="generative", cd_k=1,
                                   compute_dtype=dt)
            epoch = make_epoch_scan(step)
            params = init_params(jax.random.key(0), 16, 8, 2)
            key = jax.random.key(1)
            for _ in range(30):
                key, k = jax.random.split(key)
                params, _ = epoch(params, k, xb.astype(dt), yb, 0.1)
            # params stay f32 regardless of compute dtype
            assert params.weights.dtype == jnp.float32
            preds = np.argmax(np.asarray(predict_proba(params, jnp.asarray(x))), axis=1)
            accs[dt] = (preds == y).mean()
        assert accs[jnp.bfloat16] >= accs[jnp.float32] - 0.05
        assert accs[jnp.float32] > 0.9


class TestImageShapedInputs:
    def test_train_rbm_flattens_remainder_batch(self, rng):
        """(N, H, W) train_x with N % batch_size != 0 used to crash on the
        unflattened remainder batch (round-2 review finding)."""
        x = (rng.uniform(0, 1, (10, 4, 4)) > 0.5).astype("float32")
        y = rng.integers(0, 2, 10).astype("float32")
        rbm = ClassificationRBM(num_visible=16, num_hidden=4, k=1,
                                num_classes=2, learning_rate=0.1, seed=0)
        loss_list, _, _ = rbm.train_rbm(x, y, epochs=1, batch_size=3)
        assert len(loss_list) == 1 and np.isfinite(loss_list[0])


class TestRBMReinit:
    def test_reinit_params_fresh_and_deterministic(self):
        kw = dict(num_visible=10, num_hidden=4, seed=3, learning_rate=0.1)
        r1 = ClassificationRBM(**kw)
        orig = np.asarray(r1.params.weights).copy()
        r1.reinit_params()
        assert not np.allclose(orig, np.asarray(r1.params.weights))
        r2 = ClassificationRBM(**kw)
        r2.reinit_params()
        np.testing.assert_array_equal(np.asarray(r1.params.weights),
                                      np.asarray(r2.params.weights))

    def test_train_rbm_reinit_triggers_on_flatline(self, rng):
        x = (rng.uniform(0, 1, (12, 10)) > 0.5).astype("float32")
        y = np.zeros(12, dtype="float32")  # majority fraction 1.0
        rbm = ClassificationRBM(num_visible=10, num_hidden=4, seed=0,
                                learning_rate=0.0)
        before = np.asarray(rbm.params.weights).copy()
        rbm.train_rbm(x, y, epochs=2, batch_size=6, test_x=x, test_y=y,
                      reinit_on_collapse=1)
        # lr=0 → only the re-init can have changed the weights
        assert not np.allclose(before, np.asarray(rbm.params.weights))


class TestLateR5ReviewFixes:
    def test_train_rbm_oversized_batch_trains_remainder(self, rng):
        """batch_size > len(train) used to ZeroDivisionError; the promise
        (sweep.py directs such callers here) is that the whole set trains
        as one remainder batch."""
        x = (rng.uniform(0, 1, (10, 8)) > 0.5).astype("float32")
        y = rng.integers(0, 2, 10).astype("float32")
        rbm = ClassificationRBM(num_visible=8, num_hidden=3, seed=0,
                                learning_rate=0.2)
        before = np.asarray(rbm.params.weights).copy()
        losses, _, _ = rbm.train_rbm(x, y, epochs=2, batch_size=64)
        assert len(losses) == 2 and np.isfinite(losses).all()
        assert not np.allclose(before, np.asarray(rbm.params.weights))

    def test_train_rbm_oversized_batch_pcd_raises(self, rng):
        x = (rng.uniform(0, 1, (6, 8)) > 0.5).astype("float32")
        y = rng.integers(0, 2, 6).astype("float32")
        rbm = ClassificationRBM(num_visible=8, num_hidden=3, seed=0,
                                method="pcd")
        with pytest.raises(ValueError, match="batch_size"):
            rbm.train_rbm(x, y, epochs=1, batch_size=64)

    def test_unknown_method_raises(self):
        """A typo'd method used to silently no-op (zero updates, 0.0 loss)."""
        from qbmx.models.rbm import make_train_step

        with pytest.raises(ValueError, match="unknown method"):
            make_train_step(num_classes=2, method="Discriminative")
        with pytest.raises(ValueError, match="unknown method"):
            ClassificationRBM(num_visible=4, num_hidden=2, method="cd")

    def test_repeated_train_rbm_reuses_epoch_program(self, rng):
        """train_rbm caches the epoch closure on the instance so repeated
        calls don't recompile the whole-epoch scan."""
        x = (rng.uniform(0, 1, (12, 8)) > 0.5).astype("float32")
        y = rng.integers(0, 2, 12).astype("float32")
        rbm = ClassificationRBM(num_visible=8, num_hidden=3, seed=0)
        rbm.train_rbm(x, y, epochs=1, batch_size=6)
        fn_first = rbm._epoch_fn
        rbm.train_rbm(x, y, epochs=1, batch_size=6)
        assert rbm._epoch_fn is fn_first
