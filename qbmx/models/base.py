"""Abstract model base — the qbmx counterpart of the reference ``MODEL`` abc
(``src/model/model_ab.py``): common checkpoint/predict protocol shared by
the QBM families.  Parameters live in jax pytrees and randomness in explicit
PRNG keys (the reference seeds global numpy instead)."""

from __future__ import annotations

import abc
import pickle
from pathlib import Path

import numpy as np


class QBMModel(abc.ABC):
    """Protocol every qbmx model family satisfies (DiscQBM, CDQBM, and the
    RBM wrapper follow the same surface; see each class)."""

    @abc.abstractmethod
    def weight_objects(self) -> list:
        """Reference-format weight list for pickle checkpoints."""

    @abc.abstractmethod
    def train_for_one_iteration(self, x_batch, y_batch, learning_rate, mask=None):
        """One masked moment-matching update; returns (err, nll)."""

    @abc.abstractmethod
    def predict_batch(self, X):
        """(predictions, class_probs) for a batch of inputs."""

    def save_weights(self, title: str, path: str = "out"):
        Path(path).mkdir(parents=True, exist_ok=True)
        with open(f"{path}/{title}.pkl", "wb") as f:
            pickle.dump(self.weight_objects(), f)

    def predict(self, data):
        preds, _ = self.predict_batch(np.asarray(data)[None])
        return int(preds[0])

    def get_num_params(self):
        """Total trainable parameter count (reference ``get_num_params``,
        ``src/ClassificationRBM.py:297-307``)."""
        import jax

        return sum(int(np.prod(np.asarray(p).shape)) for p in jax.tree.leaves(self.params))
