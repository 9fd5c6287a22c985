"""Cross-model warm starts: CD-trained RBM → discriminative QBM.

The hybrid recipe from BASELINE.json ("hybrid CD warm-start +
annealer-sampled gradients"): pre-train a ClassificationRBM cheaply with
the exact/CD gradient, then map its parameters onto a flat Disc_QBM and
continue with clamped/unclamped annealer-sampled moment matching.

Mapping (energy-sign aware): the RBM's joint energy is
``-E = x·W·h + c·h + d·y + y·U·h (+ b·x)`` while the QBM QUBO is a
*minimized* energy with the same structure, so every RBM parameter maps
with a sign flip:

    w_vh[label rows]  = -U.T        (class→hidden couplings)
    w_vh[input rows]  = -W          (input→hidden couplings)
    b_h               = -c
    b_o               = -d
    w_vo, w_oo, w_hh  = 0           (absent from an RBM)

With one-hot QBM labels the mapping is exact; with a single binary output
node the two class columns collapse to their difference (class1 − class0),
which preserves the discriminative decision function.
"""

from __future__ import annotations

import jax.numpy as jnp

from qbmx.models.dqbm import DiscQBM, DQBMParams
from qbmx.models.rbm import RBMParams


def rbm_to_dqbm_params(rbm_params: RBMParams, use_one_hot: bool) -> DQBMParams:
    W = rbm_params.weights  # (V, H)
    U = rbm_params.class_weights  # (C, H)
    c = rbm_params.hidden_bias  # (H,)
    d = rbm_params.class_bias  # (C,)
    V, H = W.shape
    if use_one_hot:
        label_rows = -U
        b_o = -d
        b_h = -c
    else:
        if U.shape[0] != 2:
            raise ValueError("binary-node warm start needs a 2-class RBM")
        # exact collapse: absorb class-0 contributions into the hidden bias
        # so s=0 reproduces the y=0 conditionals and s=1 the y=1 ones
        label_rows = -(U[1] - U[0])[None, :]
        b_o = (-(d[1] - d[0]))[None]
        b_h = -(c + U[0])
    n_out = label_rows.shape[0]
    return DQBMParams(
        w_vh=jnp.concatenate([label_rows, -W], axis=0),
        w_vo=jnp.zeros((V, n_out)),
        w_oo=jnp.zeros((n_out, n_out)),
        b_h=b_h,
        b_o=b_o,
        w_hh=jnp.zeros((H, H)),
    )


def warm_start_dqbm(rbm, **dqbm_kwargs) -> DiscQBM:
    """Build a DiscQBM whose parameters are initialized from a trained
    ClassificationRBM; training then continues with sampled gradients."""
    use_one_hot = dqbm_kwargs.pop("use_one_hot_encoding", rbm.num_classes > 2)
    model = DiscQBM(
        dim_input=rbm.num_visible,
        num_classes=rbm.num_classes,
        n_hidden_nodes=rbm.num_hidden,
        use_one_hot_encoding=use_one_hot,
        **dqbm_kwargs,
    )
    model.params = rbm_to_dqbm_params(rbm.params, use_one_hot)
    return model
