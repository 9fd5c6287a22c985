"""Command-line parity: every LIVE reference flag parses on the qbmx CLIs.

A reference user must be able to paste their existing command lines at the
qbmx mains unchanged.  The reference surfaces are:

* ``rbm_main.py:14-28``   — torch RBM main (3 of its flags are dead code:
  ``--early-stop`` / ``--data-folder`` are parsed but never read, and
  ``--no-cuda`` gates a GPU that qbmx never uses; their deliberate absence
  is documented in ``qbmx/cli/rbm_main.py``).
* ``qbm_main.py:140-210`` — flat Disc_QBM main.
* ``cdqbm_main.py:163-244`` — Conv-Deep-QBM main.

These tests parse one canonical full command line per CLI (every live
reference flag with a non-default value) and pin the parsed values, so a
dropped or renamed flag fails loudly here instead of in a user's shell.
"""

from qbmx.cli import cdqbm_main, qbm_main, rbm_main


class TestReferenceCommandLinesParse:
    def test_rbm_main_accepts_reference_flags(self):
        flags = rbm_main.build_parser().parse_args([
            "--lr", "0.05",
            "--epochs", "7",
            "--batch-size", "16",
            "--visible-units", "784",
            "--hidden-units", "12",
            "--cd-k", "3",
            "--type", "discriminative",
            "--sparsity-coeffectient", "0.01",
            "--generative-factor", "0.02",
        ])
        assert flags.lr == 0.05
        assert flags.epochs == 7
        assert flags.batch_size == 16
        assert flags.visible_units == 784
        assert flags.hidden_units == 12
        assert flags.cd_k == 3
        assert flags.type == "discriminative"
        assert flags.sparsity_coeffectient == 0.01
        assert flags.generative_factor == 0.02

    def test_qbm_main_accepts_reference_flags(self):
        flags = qbm_main.build_parser().parse_args([
            "-hn", "5",
            "-lr", "0.307",
            "-r", "False",
            "-e", "20",
            "-b", "60",
            "-s", "3492574433",
            "-sc", "1000",
            "--solver", "SA",
            "--data_set", "breastmnist",
            "--num_classes", "2",
            "--parallelize", "True",
            "--load_path", "some/ckpt.pkl",
            "--name", "qbm_sa",
        ])
        assert flags.hnodes == 5
        assert flags.learning_rate == 0.307
        assert flags.restricted is False
        assert flags.epochs == 20 and flags.batch_size == 60
        assert flags.seed == 3492574433 and flags.sample_count == 1000
        assert flags.solver == "SA" and flags.data_set == "breastmnist"
        assert flags.num_classes == 2 and flags.parallelize is True
        assert flags.load_path == "some/ckpt.pkl" and flags.name == "qbm_sa"

    def test_cdqbm_main_accepts_reference_flags(self):
        flags = cdqbm_main.build_parser().parse_args([
            "-lr", "0.05",
            "-r", "True",
            "-e", "3",
            "-b", "10",
            "-s", "7",
            "-sc", "100",
            "--anneal", "500",
            "--solver", "SA",
            "--data_set", "mnist",
            "--num_classes", "2",
            "--parallelize", "True",
            "--save", "out/cd",
            "--name", "conv",
            "--pooling_size", "4",
            "--pooling_type", "probabilistic",
            "--hidden_bias_type", "shared",
            "--one_hot",
        ])
        assert flags.learning_rate == 0.05 and flags.restricted is True
        assert flags.epochs == 3 and flags.batch_size == 10
        assert flags.seed == 7 and flags.sample_count == 100
        assert flags.anneal == 500 and flags.solver == "SA"
        assert flags.data_set == "mnist" and flags.num_classes == 2
        assert flags.parallelize is True
        assert flags.save == "out/cd" and flags.name == "conv"
        assert flags.pooling_size == 4
        assert flags.pooling_type == "probabilistic"
        assert flags.hidden_bias_type == "shared"
        assert flags.one_hot is True

    def test_parallelize_is_parity_noop(self):
        """``--parallelize`` is accepted on both QBM CLIs but maps to
        nothing: chains are always batched on device, and the reference's
        parallel-QA role (``src/model/faster_dqbm.py:435-501``) is carried
        by ``--qpu_copies`` instead."""
        for mod in (qbm_main, cdqbm_main):
            assert mod.build_parser().parse_args(
                ["--parallelize", "False"]).parallelize is False
