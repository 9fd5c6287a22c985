"""Full training-state checkpointing (params + history + RNG + epoch).

The reference checkpoints only the weight pickle per epoch and on crash
(``src/model/faster_dqbm.py:1069-1077, 1128-1134``); resuming re-derives
everything else.  Here a checkpoint is a single ``.npz`` with
path-addressed parameter leaves plus a JSON-encoded scalar state, so a run
resumes exactly (same params, same PRNG stream position, same history).
Reference-format weight pickles remain supported through each model's
``save_weights`` / ``load_savepoint`` / ``load_params``.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from qbmx.utils.metrics import History


def _flatten_params(params):
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path, model, history: History | None = None, epoch: int = 0,
                    mid_epoch: bool = False):
    """``mid_epoch=True`` stamps a crash snapshot whose params may already be
    partially advanced INTO the epoch after ``epoch`` (unrolled-segment
    launches mutate params per segment) — resuming from it double-trains part
    of an epoch, so ``load_checkpoint`` refuses it without an explicit
    opt-in (ADVICE r4)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f"param:{k}": v for k, v in _flatten_params(model.params).items()}
    arrays["rng_key"] = np.asarray(jax.random.key_data(model.key))
    meta = {
        "epoch": int(epoch),
        "history": dataclasses.asdict(history) if history is not None else None,
        "model_class": type(model).__name__,
        "mid_epoch": bool(mid_epoch),
        # flatline-recovery counter (reinit_on_collapse): without it a
        # resumed run would re-derive fold_in(key(seed), 1) — the exact
        # init basin that already flatlined before the checkpoint
        "reinit_attempt": int(getattr(model, "_reinit_attempt", 0)),
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path, model, allow_mid_epoch: bool = False) -> tuple[History | None, int]:
    """Restore params/RNG into ``model`` in place; returns (history, epoch).

    Refuses a checkpoint saved from a different model class — matching
    param-tree shapes do NOT imply matching semantics (the recorded
    ``model_class`` exists to catch exactly this).  Also refuses a
    ``mid_epoch``-stamped crash snapshot unless ``allow_mid_epoch=True``:
    its params may sit between epoch boundaries, so resuming silently
    double-trains part of an epoch and loses the bit-identical-resume
    guarantee (use the last periodic end-of-epoch checkpoint instead)."""
    data = np.load(Path(path) if str(path).endswith(".npz") else Path(str(path) + ".npz"))
    saved_meta = json.loads(bytes(data["meta_json"]).decode())
    saved_cls = saved_meta.get("model_class")
    if saved_cls is not None and saved_cls != type(model).__name__:
        raise ValueError(
            f"checkpoint was saved from {saved_cls}, not {type(model).__name__}")
    if saved_meta.get("mid_epoch") and not allow_mid_epoch:
        raise ValueError(
            f"{path} is a mid-epoch crash snapshot: its params may already be "
            "partially advanced into the crashed epoch, so resuming from it "
            "double-trains part of an epoch. Resume from the last periodic "
            "checkpoint, or pass allow_mid_epoch=True to accept the skew.")
    flat = {k[len("param:"):]: data[k] for k in data.files if k.startswith("param:")}

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(model.params)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = "/".join(str(x) for x in p)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key}")
        arr = flat[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.asarray(leaf).shape}")
        new_leaves.append(jnp.asarray(arr))
    model.params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    model.key = jax.random.wrap_key_data(jnp.asarray(data["rng_key"]))
    model._reinit_attempt = int(saved_meta.get("reinit_attempt", 0))

    meta = json.loads(bytes(data["meta_json"]).decode())
    history = None
    if meta.get("history") is not None:
        h = meta["history"]
        history = History(**{k: h.get(k, []) for k in History.__dataclass_fields__})
    return history, meta.get("epoch", 0)
