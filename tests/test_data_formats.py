"""Loader tests on the REAL byte formats (VERDICT r1 #8).

The reference tree is missing the FashionMNIST/CIFAR image blobs, so the
round-1 loaders were never exercised on actual idx/pickle bytes.  Here the
blobs are synthesized in their true formats (``qbmx/data/synthesize.py``)
— including label streams copied from the reference's REAL label files
when mounted — and parsed through the same code path a full archive would
take (``src/data_loader.py:23-112`` parity; ``qbm_main.py:45`` CIFAR)."""

from __future__ import annotations

import gzip
import os
from pathlib import Path

import numpy as np
import pytest

from qbmx.data import loaders
from qbmx.data.synthesize import (
    read_idx1,
    synthesize_cifar10,
    synthesize_fashionmnist,
    write_idx1,
    write_idx3,
)

REF_FASHION = Path("/root/reference/src/data/fashionmnist")


def test_fashionmnist_idx_roundtrip(tmp_path):
    d = synthesize_fashionmnist(tmp_path, seed=3)
    x, y = loaders.get_fashionmnist(
        str(d / "train-images-idx3-ubyte"), str(d / "train-labels-idx1-ubyte"),
        classes=[0, 1], samples_per_class=20,
    )
    assert x.shape == (40, 28, 28) and x.dtype == np.float32
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert set(np.unique(y)) == {0, 1}


def test_fashionmnist_uses_real_reference_labels(tmp_path):
    if not REF_FASHION.is_dir():
        pytest.skip("reference tree not mounted")
    lt = read_idx1(REF_FASHION / "train-labels-idx1-ubyte")
    le = read_idx1(REF_FASHION / "t10k-labels-idx1-ubyte")
    d = synthesize_fashionmnist(tmp_path, labels_train=lt, labels_test=le,
                                max_train=500, max_test=200)
    x, y = loaders.get_fashionmnist(
        str(d / "train-images-idx3-ubyte"), str(d / "train-labels-idx1-ubyte"))
    # label stream must be byte-for-byte the reference's prefix
    np.testing.assert_array_equal(y, lt[:500])
    assert x.shape == (500, 28, 28)


def test_mnist_gz_roundtrip(tmp_path):
    """get_mnist parses gzip idx — write a gz pair and read it back."""
    labels = np.asarray([7, 1, 7, 3] * 10, dtype=np.uint8)
    from qbmx.data.synthesize import class_template_images

    imgs = class_template_images(labels, seed=1)
    raw_i = write_idx3(tmp_path / "imgs.tmp", imgs).read_bytes()
    raw_l = write_idx1(tmp_path / "lbls.tmp", labels).read_bytes()
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(raw_i)
    with gzip.open(tmp_path / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(raw_l)
    x, y = loaders.get_mnist(str(tmp_path / "train-images-idx3-ubyte.gz"),
                             str(tmp_path / "train-labels-idx1-ubyte.gz"))
    np.testing.assert_array_equal(y, labels)
    np.testing.assert_allclose(x[0], imgs[0] / 255.0, atol=1e-6)


def test_cifar10_batches_roundtrip(tmp_path):
    d = synthesize_cifar10(tmp_path, n_per_train_batch=100, n_test=80)
    x, y = loaders.get_cifar10(str(d), train=True)
    assert x.shape == (500, 32, 32)  # grayscaled
    assert 0.0 <= x.min() and x.max() <= 1.0
    xt, yt = loaders.get_cifar10(str(d), train=False, classes=[3, 5])
    assert set(np.unique(yt)) == {0, 1}  # binary remap
    assert len(xt) == len(yt)


def test_cifar10_grayscale_is_luma(tmp_path):
    d = synthesize_cifar10(tmp_path, n_per_train_batch=10, n_test=5)
    import pickle

    with open(d / "data_batch_1", "rb") as f:
        raw = pickle.load(f, encoding="bytes")
    rgb = raw[b"data"][0].reshape(3, 32, 32).astype("float32") / 255
    want = 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]
    x, _ = loaders.get_cifar10(str(d), train=True)
    # batches are concatenated in order, no shuffle without classes/size
    np.testing.assert_allclose(x[0], want, atol=1e-6)


def test_cli_load_dataset_cifar_and_fashion(tmp_path, monkeypatch):
    """The CLI dataset vocabulary resolves both datasets via QBMX_DATA_DIR."""
    synthesize_fashionmnist(tmp_path, seed=0)
    synthesize_cifar10(tmp_path, n_per_train_batch=100, n_test=60, seed=0)
    monkeypatch.setenv("QBMX_DATA_DIR", str(tmp_path))
    monkeypatch.setattr(loaders, "_DATA_ROOT_CANDIDATES", (str(tmp_path),))
    from qbmx.cli._common import load_dataset

    (tx, ty), _, (ex, ey) = load_dataset("fashionmnist", seed=0,
                                         samples_per_class=15)
    assert tx.shape[1:] == (28, 28) and set(np.unique(ty)) <= {0, 1}
    (tx, ty), _, (ex, ey) = load_dataset("cifar-10", seed=0,
                                         samples_per_class=30)
    assert tx.shape[1:] == (32, 32) and set(np.unique(ty)) <= {0, 1}


def test_resolve_subdir_hint_prevents_cross_dataset_shadowing(tmp_path, monkeypatch):
    """A fashionmnist-hinted request must NOT resolve to a same-named MNIST
    blob (round-2 review finding)."""
    (tmp_path / "mnist").mkdir()
    (tmp_path / "mnist" / "train-images-idx3-ubyte").write_bytes(b"\0" * 32)
    monkeypatch.setattr(loaders, "_DATA_ROOT_CANDIDATES", (str(tmp_path),))
    with pytest.raises(FileNotFoundError):
        loaders._resolve("fashionmnist/train-images-idx3-ubyte")
    # hinted to the right subdir, it resolves
    assert loaders._resolve("mnist/train-images-idx3-ubyte").endswith(
        "mnist/train-images-idx3-ubyte")
    # bare filenames still search all subdirs (back-compat)
    assert loaders._resolve("train-images-idx3-ubyte")
