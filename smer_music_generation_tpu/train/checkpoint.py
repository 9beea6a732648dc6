"""Orbax checkpointing with the reference's payload contract.

The reference saves ``{model_state_dict, optimizer_state_dict, epoch,
loss}`` per epoch and resumes with an optional epoch reset
(``train.py:266-303, 967-973``).  Here the payload is
``{params, opt_state, step, lr, epoch, loss}`` via orbax.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

try:  # ml_dtypes ships with jax; bfloat16 as a numpy extension dtype
    from ml_dtypes import bfloat16 as np_bfloat16
except ImportError:  # pragma: no cover - ml_dtypes is a jax dependency
    import jax.numpy as _jnp

    np_bfloat16 = _jnp.bfloat16

from .state import TrainState


def save_checkpoint(
    directory: str, epoch: int, state: TrainState, loss: float
) -> str:
    path = os.path.abspath(os.path.join(directory, f"checkpoint_{epoch}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "lr": state.lr,
        "epoch": np.int32(epoch),
        "loss": np.float32(loss),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def checkpoint_has_final_norm(path: str) -> Optional[bool]:
    """Inspect a saved checkpoint for the final-LayerNorm params.

    ``final_norm`` defaults to True since the torch-parity change (it adds
    ``norm_e``/``norm_d`` to the parameter tree, mirroring the reference's
    ``transformer.encoder.norm``/``decoder.norm``); checkpoints written
    before that have no such keys.  Callers use this to construct a
    matching ``ModelConfig(final_norm=...)`` before restoring — the same
    presence check ``train/convert.py:111`` applies to torch files.
    Returns None when the structure cannot be read.
    """
    try:
        meta = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
        tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
        params = tree["params"]["params"]
        return "norm_e" in params or "norm_d" in params
    except Exception:
        return None


def restore_checkpoint(
    path: str, state: TrainState
) -> Tuple[TrainState, int, float]:
    """Restore into the shape/dtype structure of ``state``.

    Raises a descriptive error when the checkpoint's ``final_norm`` layout
    disagrees with the model that built ``state`` (ADVICE r1: the default
    flipped to True; old checkpoints need ``final_norm=False``).
    """
    has_norm = checkpoint_has_final_norm(path)
    if has_norm is not None:
        state_has_norm = "norm_e" in state.params.get("params", {})
        if has_norm != state_has_norm:
            want = "final_norm=True" if has_norm else "final_norm=False"
            raise ValueError(
                f"checkpoint {path!r} was written with {want} but the model "
                f"was built with final_norm={state_has_norm}; rebuild the "
                f"model with ModelConfig({want}) (see "
                "checkpoint_has_final_norm) and restore again"
            )
    abstract = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, state.params),
        "opt_state": jax.tree.map(ocp.utils.to_shape_dtype_struct, state.opt_state),
        "step": ocp.utils.to_shape_dtype_struct(state.step),
        "lr": ocp.utils.to_shape_dtype_struct(state.lr),
        "epoch": jax.ShapeDtypeStruct((), np.int32),
        "loss": jax.ShapeDtypeStruct((), np.float32),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), abstract)
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        lr=restored["lr"],
    )
    return new_state, int(restored["epoch"]), float(restored["loss"])


def restore_params_only(path: str, abstract_state) -> Tuple[dict, int]:
    """Restore just ``(params, epoch)`` from a full train checkpoint.

    Inference/serving/eval never need the Adam state — roughly 2x the
    param bytes — so its leaves are marked ``ocp.PLACEHOLDER`` and never
    deserialized (the reference likewise loads only ``model_state_dict``
    at eval, ``evaluation.py:1601-1607``).  ``abstract_state`` is a
    ``jax.eval_shape`` of ``TrainState.create`` so nothing is allocated
    for the skipped subtree on the caller's side either.
    """
    abstract = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state.params),
        "opt_state": jax.tree.map(lambda _: ocp.PLACEHOLDER, abstract_state.opt_state),
        "step": ocp.utils.to_shape_dtype_struct(abstract_state.step),
        "lr": ocp.utils.to_shape_dtype_struct(abstract_state.lr),
        "epoch": jax.ShapeDtypeStruct((), np.int32),
        "loss": jax.ShapeDtypeStruct((), np.float32),
    }
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(item=abstract)
        )
    return restored["params"], int(restored["epoch"])


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    candidates = []
    for name in os.listdir(directory):
        if name.startswith("checkpoint_"):
            try:
                candidates.append((int(name.split("_")[-1]), name))
            except ValueError:
                continue
    if not candidates:
        return None
    return os.path.join(directory, max(candidates)[1])


def export_params_msgpack(path: str, params, meta: Optional[dict] = None) -> str:
    """Write a params-only bf16 msgpack snapshot (~1/6 of a full orbax
    checkpoint: no Adam moments, half-width weights).

    Orbax run dirs live under gitignored ``runs/`` and die with the
    ephemeral build host; this compact form is small enough to commit, so
    trained-weights demos (bench ``single_trained`` leg, generate/serve
    examples) survive host wipes.  bf16 is the decode compute dtype
    already, so a reloaded model's inference path is unchanged; training
    resumption is NOT supported from this format (no opt_state).

    A ``<path>.json`` sidecar records provenance (``meta``) so the
    snapshot is auditable.
    """
    import json

    from flax import serialization

    def _cast(a):
        a = np.asarray(a)
        return a.astype(np_bfloat16) if a.dtype == np.float32 else a

    payload = jax.tree.map(_cast, jax.device_get(params))
    data = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)
    if meta is not None:
        with open(path + ".json", "w") as fh:
            json.dump(meta, fh, indent=1, sort_keys=True)
    return path


def import_params_msgpack(path: str, abstract_params) -> dict:
    """Load an :func:`export_params_msgpack` snapshot into the structure of
    ``abstract_params`` (e.g. ``jax.eval_shape`` of ``model.init``), casting
    each leaf back to the abstract dtype (f32 master params)."""
    from flax import serialization

    with open(path, "rb") as fh:
        data = fh.read()
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract_params)
    restored = serialization.from_bytes(target, data)
    return jax.tree.map(
        lambda a, s: np.asarray(a).astype(s.dtype), restored, abstract_params
    )
