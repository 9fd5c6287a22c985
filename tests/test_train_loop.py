"""Training-loop driver: crash insurance, history bookkeeping, scan gating."""

import pickle

import jax

import numpy as np
import pytest

from qbmx.models.dqbm import DiscQBM
from qbmx.samplers.api import GibbsSampler, SASampler
from qbmx.train.loop import get_best_combined_acc_auc, train_model
from qbmx.utils.metrics import History


class FailingModel:
    """Minimal model that fails on the second batch."""

    def __init__(self):
        self.calls = 0
        self.seed = 1
        self.saved = []

    def train_for_one_iteration(self, x, y, lr, mask=None):
        self.calls += 1
        if self.calls >= 2:
            raise RuntimeError("boom")
        return 0.1, 0.5

    def save_weights(self, title, path):
        self.saved.append((title, path))
        with open(f"{path}/{title}.pkl", "wb") as f:
            pickle.dump(["w"], f)


class TestCrashInsurance:
    def test_crash_saves_weights_and_history(self, tmp_path):
        model = FailingModel()
        x = np.zeros((8, 3), dtype="float32")
        y = np.zeros(8, dtype="float32")
        with pytest.raises(RuntimeError):
            train_model(model, x, y, batch_size=4, learning_rate=0.1, epochs=1,
                        save_folder=str(tmp_path), verbose=False)
        # crash checkpoint written (reference src/model/faster_dqbm.py:1128-1132)
        assert any("crash" in t for t, _ in model.saved)
        assert (tmp_path / "loss_per_batch.pkl").exists()
        with open(tmp_path / "loss_per_batch.pkl", "rb") as f:
            assert pickle.load(f) == [0.1]  # first batch recorded pre-crash


class TestHistoryBookkeeping:
    def test_per_seed_pickles_and_best_epoch(self, tmp_path):
        model = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=9, sample_count=16,
                        sampler=GibbsSampler(num_warmup=4))
        x = np.random.default_rng(0).uniform(0, 1, (12, 3)).astype("float32")
        y = np.asarray([0, 1] * 6, dtype="float32")
        history = train_model(model, x, y, x, y, batch_size=6, learning_rate=0.1,
                              epochs=3, save_folder=str(tmp_path), verbose=False)
        assert len(history.acc_per_epoch) == 3
        assert len(history.nll_per_batch) == 6  # 2 batches × 3 epochs
        assert (tmp_path / "acc_per_epoch9.pkl").exists()
        assert (tmp_path / "e3.pkl").exists()  # per-epoch weights
        best_epoch, acc, auc, combined = get_best_combined_acc_auc(history)
        assert combined == max(history.combined_acc_auc_per_epoch)
        assert combined == pytest.approx(0.5 * acc + 0.5 * auc)


class TestScanGating:
    def test_gibbs_sampler_allows_scan(self):
        m = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=8,
                    sampler=GibbsSampler(num_warmup=4))
        assert m.supports_epoch_scan()

    def test_forced_pallas_disables_scan(self):
        m = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=8,
                    sampler=SASampler(num_sweeps=8, use_pallas=True))
        assert not m.supports_epoch_scan()

    def test_scan_and_loop_agree_statistically(self):
        """Same data, same sampler type: scanned-epoch and per-batch paths
        must produce comparable parameter updates."""
        import jax

        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (12, 3)).astype("float32")
        y = np.asarray([0, 1] * 6, dtype="float32")
        from qbmx.samplers.api import ExactSampler

        m1 = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=4, sample_count=2048,
                     sampler=ExactSampler())
        m2 = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=4, sample_count=2048,
                     sampler=ExactSampler())
        m1.train_epoch(x, y, 6, 0.3)
        for b in range(0, 12, 6):
            m2.train_for_one_iteration(x[b:b+6], y[b:b+6], 0.3)
        for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=0.05)


class TestReinitOnCollapse:
    def test_model_reinit_params_rederives_fresh_deterministic_init(self):
        from qbmx.models.dqbm import DiscQBM
        from qbmx.samplers.api import SASampler

        kw = dict(dim_input=5, n_hidden_nodes=3, seed=9, sample_count=8,
                  restricted=False,
                  sampler=SASampler(num_sweeps=4, use_pallas=False))
        m = DiscQBM(**kw)
        orig = jax.tree.map(lambda a: np.asarray(a).copy(), m.params)
        m.reinit_params()
        changed = any(not np.allclose(a, b) for a, b in
                      zip(jax.tree.leaves(orig), jax.tree.leaves(m.params)))
        assert changed
        m2 = DiscQBM(**kw)
        m2.reinit_params()
        for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(m2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_model_reinit_triggers_on_flatline(self, rng):
        from qbmx.models.dqbm import DiscQBM
        from qbmx.samplers.api import SASampler
        from qbmx.train.loop import train_model

        x = rng.uniform(0, 1, (12, 4)).astype("float32")
        y = np.zeros(12, dtype="float32")  # majority fraction 1.0: always "stuck"
        m = DiscQBM(dim_input=4, n_hidden_nodes=2, seed=0, sample_count=8,
                    restricted=False,
                    sampler=SASampler(num_sweeps=4, use_pallas=False))
        before = jax.tree.map(lambda a: np.asarray(a).copy(), m.params)
        train_model(m, x, y, x, y, batch_size=6, learning_rate=0.0, epochs=2,
                    verbose=False, reinit_on_collapse=1)
        # lr=0 → only the re-init can have changed the params
        changed = any(not np.allclose(a, b) for a, b in
                      zip(jax.tree.leaves(before), jax.tree.leaves(m.params)))
        assert changed
