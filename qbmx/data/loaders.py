"""Dataset ingest: MNIST / FashionMNIST / MedMNIST (+ synthetic).

Capability parity with the reference ``src/data_loader.py``: idx.gz parsing
(``get_mnist``, ``:23-73``), raw-idx FashionMNIST (``:76-112``), MedMNIST
.npz with label-column select / positive duplication / balancing
(``get_medmnist``, ``:115-167``), undersampling (``:171-205``), flatten +
optional PCA preprocessing (``preprocess_images``, ``:240-276``; the val
slot is handled consistently here — the reference's two CLIs disagree on
argument order, SURVEY.md §2c.6), shuffling (``:279-285``), one-hot
(``:288-296``) and pad-reflatten (``:300-326``).

Host-side file parsing stays numpy; anything per-pixel that feeds training
(binarization, flattening) is trivially jittable downstream.
"""

from __future__ import annotations

import gzip
import os
from pathlib import Path

import numpy as np

_DATA_ROOT_CANDIDATES = (
    os.environ.get("QBMX_DATA_DIR", ""),
    "data",
    "src/data",
    "/root/reference/src/data",
)


def find_data_root() -> Path | None:
    """First existing dataset root (several may coexist — _resolve tries all)."""
    for cand in _DATA_ROOT_CANDIDATES:
        if cand and Path(cand).is_dir():
            return Path(cand)
    return None


_KNOWN_SUBDIRS = ("mnist", "fashionmnist", "medmnist")


def _resolve(path: str) -> str:
    """Find a dataset file across EVERY candidate root (a partially
    populated ./data must not shadow the reference tree's files).

    When the requested path names one of the dataset subdirs (e.g.
    ``fashionmnist/train-images-idx3-ubyte``) ONLY that subdir is searched
    — MNIST and FashionMNIST share bare filenames, and resolving across
    datasets would silently train on the wrong images."""
    if Path(path).exists():
        return path
    rel = Path(path)
    hint = rel.parent.name if rel.parent.name in _KNOWN_SUBDIRS else None
    for cand in _DATA_ROOT_CANDIDATES:
        if not cand or not Path(cand).is_dir():
            continue
        subs = (hint,) if hint else ("",) + _KNOWN_SUBDIRS
        for sub in subs:
            p = Path(cand) / sub / rel.name
            if p.exists():
                return str(p)
    raise FileNotFoundError(path)


def _subsample_per_class(images, labels, samples_per_class, seed):
    """Deviation from the reference (``src/data_loader.py:52-58``): a class
    with fewer than ``samples_per_class`` examples is taken whole instead
    of raising (np.random.choice with replace=False would) — required for
    the t10k fallback splits where class sizes are uneven."""
    rng = np.random.default_rng(seed)
    sel_x, sel_y = [], []
    for cls in np.unique(labels):
        idx = np.where(labels == cls)[0]
        pick = rng.choice(idx, size=min(samples_per_class, len(idx)), replace=False)
        sel_x.append(images[pick])
        sel_y.append(labels[pick])
    return np.concatenate(sel_x), np.concatenate(sel_y)


def _finish_classification(images, labels, classes, size, samples_per_class, seed):
    if classes is not None:
        mask = np.isin(labels, classes)
        images, labels = images[mask], labels[mask]
    if samples_per_class is not None:
        images, labels = _subsample_per_class(images, labels, samples_per_class, seed)
    if size is not None:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(images))[:size]
        images, labels = images[idx], labels[idx]
    if classes is not None and len(classes) == 2:
        labels = np.asarray([0 if l == classes[0] else 1 for l in labels])
    return images, np.asarray(labels)


def get_mnist(file_image: str, file_labels: str, classes=None, size=None,
              samples_per_class=None, seed: int = 42):
    """Parse idx.gz MNIST files → (images (N, 28, 28) in [0,1], labels)."""
    with gzip.open(_resolve(file_image), "rb") as f:
        images = np.frombuffer(f.read(), "B", offset=16).reshape(-1, 28, 28).astype("float32") / 255
    with gzip.open(_resolve(file_labels), "rb") as f:
        labels = np.frombuffer(f.read(), "B", offset=8)
    return _finish_classification(images, labels, classes, size, samples_per_class, seed)


def get_fashionmnist(file_image: str, file_labels: str, classes=None, size=None,
                     samples_per_class=None, seed: int = 42):
    """Raw-idx FashionMNIST files (uncompressed, as in the reference tree)."""
    with open(_resolve(file_image), "rb") as f:
        images = np.frombuffer(f.read(), "B", offset=16).reshape(-1, 28, 28).astype("float32") / 255
    with open(_resolve(file_labels), "rb") as f:
        labels = np.frombuffer(f.read(), "B", offset=8)
    return _finish_classification(images, labels, classes, size, samples_per_class, seed)


def get_medmnist(file: str, index: int = 0, duplicate_positives_n_times: int = 0,
                 do_balance: bool = False, size=None, seed: int = 42):
    """MedMNIST .npz → ((train_x, train_y), (val_x, val_y), (test_x, test_y))."""
    data = np.load(_resolve(file))
    rng = np.random.default_rng(seed)

    train_x = data["train_images"].astype("float32") / 255
    val_x = data["val_images"].astype("float32") / 255
    test_x = data["test_images"].astype("float32") / 255
    train_y = data["train_labels"][:, index]
    val_y = data["val_labels"][:, index]
    test_y = data["test_labels"][:, index]

    if size is not None:
        sel_x, sel_y = [], []
        for cls, cls_size in enumerate(size):
            idx = np.where(train_y == cls)[0]
            pick = rng.choice(idx, size=cls_size, replace=len(idx) < cls_size)
            sel_x.append(train_x[pick])
            sel_y.append(train_y[pick])
        train_x, train_y = np.concatenate(sel_x), np.concatenate(sel_y)

    if duplicate_positives_n_times > 0:
        pos = np.where(train_y == 1)[0]
        for _ in range(duplicate_positives_n_times):
            train_x = np.concatenate([train_x, train_x[pos]])
            train_y = np.concatenate([train_y, train_y[pos]])

    if do_balance:
        pos = np.where(train_y == 1)[0]
        neg = np.where(train_y == 0)[0]
        pick_neg = rng.choice(neg, len(pos))
        train_x = np.concatenate([train_x[pos], train_x[pick_neg]])
        train_y = np.concatenate([train_y[pos], train_y[pick_neg]])

    return (train_x, train_y), (val_x, val_y), (test_x, test_y)


def balance_by_undersampling(train_images, train_labels, seed: int = 42):
    """Random-undersample the majority class to the minority size."""
    rng = np.random.default_rng(seed)
    pos = np.where(train_labels == 1)[0]
    neg = np.where(train_labels == 0)[0]
    if len(pos) == len(neg):
        return train_images, train_labels
    major, minor = (pos, neg) if len(pos) > len(neg) else (neg, pos)
    major = rng.permutation(major)[: len(minor)]
    idx = rng.permutation(np.concatenate([minor, major]))
    return train_images[idx], train_labels[idx]


def resize_images(images, outputshape):
    """Anti-aliased resize of an (N, H, W[, C]) image stack to
    ``outputshape`` (H', W') — the capability the reference's
    ``resize_and_flatten`` documents (16×16 encoding workflows,
    ``src/data_loader.py:240-252``) but whose actual resize call is
    commented out (``:228`` — ``outputshape`` is dead there).  Deliberate
    deviation: here the parameter does what its docstring promises.

    Linear interpolation with anti-aliasing on downsampling (the
    ``skimage.resize(..., anti_aliasing=True)`` the reference's comment
    names), via ``jax.image.resize`` batched over N."""
    import jax
    import jax.numpy as jnp

    a = np.asarray(images, dtype=np.float32)
    if a.ndim < 3:
        raise ValueError(f"resize needs (N, H, W[, C]) images, got {a.shape}")
    out = jax.image.resize(jnp.asarray(a), (a.shape[0], *outputshape, *a.shape[3:]),
                           method="linear", antialias=True)
    return np.asarray(out)


def preprocess_images(train_x, test_x, val_x=None, outputshape=None,
                      pca_n_components=None, do_flatten=True):
    """Flatten (and optionally resize / PCA-project) the splits.

    ``outputshape=(H', W')`` resizes images before flattening (see
    :func:`resize_images` for the reference-deviation note — the
    reference accepts the parameter at ``src/data_loader.py:240`` but its
    resize is commented out at ``:228``).

    Returns (train, test, val) — one consistent ordering (the reference's
    callers disagreed with its signature, SURVEY.md §2c.6).
    """
    if outputshape is not None:
        rs = lambda a: resize_images(a, outputshape) if a is not None else None
        train_x, test_x, val_x = rs(train_x), rs(test_x), rs(val_x)
    flat = lambda a: np.ascontiguousarray(
        np.asarray(a).reshape(len(a), -1)) if a is not None else None
    if do_flatten:
        train_x, test_x, val_x = flat(train_x), flat(test_x), flat(val_x)
    if pca_n_components is not None:
        from sklearn.decomposition import PCA

        pca = PCA(n_components=pca_n_components)
        train_x = pca.fit_transform(train_x)
        test_x = pca.transform(test_x)
        val_x = pca.transform(val_x) if val_x is not None else None
    return train_x, test_x, val_x


def shuffle_images(x, y, seed: int = 44):
    assert len(x) == len(y), "Input data and labels must have the same length."
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(x))
    return np.take(x, idx, axis=0), np.take(np.asarray(y), idx, axis=0)


def encode_labels_to_onehot(labels, num_classes: int):
    return np.eye(num_classes)[np.asarray(labels, dtype=int)]


def reshape_pad_and_flatten(images, original_shape, pad: int):
    """Reshape flat images to (H, W), zero-pad, return padded image stack."""
    H, W = original_shape
    images = np.asarray(images).reshape((-1, H, W))
    return np.pad(images, ((0, 0), (pad, pad), (pad, pad)), mode="constant")


def get_cifar10(data_dir: str = "cifar-10-batches-py", classes=None, size=None,
                samples_per_class=None, seed: int = 42, train: bool = True,
                grayscale: bool = True):
    """CIFAR-10 from the standard python-pickle batches on disk.

    The reference's CIFAR path (``get_cifar10_from_torch`` referenced at
    ``qbm_main.py:45``) is dead code behind commented-out torchvision
    imports; this loader reads the stock ``cifar-10-batches-py`` directory
    directly (no torchvision, no download) and grayscales to (N, 32, 32)
    like the reference's intended Grayscale transform.
    """
    import pickle

    root = Path(data_dir)
    if not root.is_dir():
        # search EVERY candidate root like _resolve does (a partially
        # populated ./data must not shadow other roots' files)
        for cand in _DATA_ROOT_CANDIDATES:
            if cand and (Path(cand) / data_dir).is_dir():
                root = Path(cand) / data_dir
                break
        else:
            raise FileNotFoundError(data_dir)
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    imgs, labels = [], []
    for name in files:
        with open(root / name, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs.append(np.asarray(d[b"data"], dtype="float32") / 255)
        labels.append(np.asarray(d[b"labels"]))
    images = np.concatenate(imgs).reshape(-1, 3, 32, 32)
    labels = np.concatenate(labels)
    if grayscale:
        # ITU-R 601 luma, matching torchvision.Grayscale
        images = (
            0.299 * images[:, 0] + 0.587 * images[:, 1] + 0.114 * images[:, 2]
        )
    else:
        images = images.transpose(0, 2, 3, 1)
    return _finish_classification(images, labels, classes, size, samples_per_class, seed)


def binarize(x, threshold: float = 0.5):
    """Binarize [0,1] pixel intensities — the CD-k/BASELINE ingest step."""
    return (np.asarray(x) > threshold).astype("float32")


def synthetic_images(n: int, shape=(28, 28), num_classes: int = 2, seed: int = 0):
    """Class-structured synthetic data for tests/benchmarks when the real
    archives are absent (the reference tree is missing MNIST train images)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n)
    base = rng.uniform(0.0, 1.0, (num_classes,) + shape)
    noise = rng.uniform(0.0, 1.0, (n,) + shape)
    images = 0.6 * base[labels] + 0.4 * noise
    return images.astype("float32"), labels
