"""Device mesh + sharding rules (DP primary, TP optional).

The reference has no distributed runtime at all (SURVEY.md §2.5); the
capability-equivalent TPU scale-out is:

* a ``jax.sharding.Mesh`` over ICI with axes ``("dp", "tp")``, optionally
  extended with a leading ``"dcn"`` axis for multi-slice pods (data
  parallelism split hierarchically over (DCN, ICI) — SURVEY §2.5's
  "DCN axis for multi-slice");
* data parallelism as the load-bearing strategy (the flagship model is
  4+4 layers x d512 — far under one chip's HBM): batch sharded on ``dp``
  (and ``dcn`` when present), params replicated, XLA inserts the gradient
  ``psum`` over ICI within a slice and DCN across slices;
* an optional tensor-parallel rule set for the FFN / attention projections
  and the (vocab, d) embedding/logit matrices, demonstrating Megatron-style
  column/row sharding under pjit for scale-up variants.  TP never crosses
  the DCN boundary (it stays an intra-slice ICI axis).

Ring-attention / sequence parallelism is intentionally out of scope: the
reference's max sequence is 2400 tokens (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
    dcn_slices: int = 1,
) -> Mesh:
    """Build a ("dp", "tp") mesh over the first ``n_devices`` devices.

    ``dcn_slices > 1`` prepends a ``"dcn"`` mesh axis of that size (mesh
    axes become ``("dcn", "dp", "tp")``): per-slice dp stays on ICI while
    the cross-slice gradient reduction rides DCN.  On real multi-slice
    hardware the device list is grouped slice-major (jax orders devices
    by (process, slice)); ``jax.experimental.mesh_utils``'s hybrid mesh
    helper is used when the runtime exposes slice topology, with a plain
    slice-major reshape as the single-process (and virtual-device test)
    fallback.  Sharding RULES are unchanged — params replicate over dcn,
    batches shard over (dcn, dp) via :func:`batch_sharding`.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % (tp * dcn_slices) != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by tp={tp} x dcn_slices={dcn_slices}"
        )
    dev = list(devices[:n_devices])
    dp = n_devices // (tp * dcn_slices)
    if dcn_slices == 1:
        return Mesh(np.array(dev).reshape(dp, tp), (DP_AXIS, TP_AXIS))
    if len({getattr(d, "slice_index", 0) for d in dev}) == dcn_slices:
        # real multi-slice runtime: let mesh_utils place the DCN axis on
        # the actual slice boundaries
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp, tp), (dcn_slices, 1), devices=dev
        )
        return Mesh(arr.reshape(dcn_slices, dp, tp), (DCN_AXIS, DP_AXIS, TP_AXIS))
    return Mesh(
        np.array(dev).reshape(dcn_slices, dp, tp), (DCN_AXIS, DP_AXIS, TP_AXIS)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp (x dcn); replicate over tp."""
    if DCN_AXIS in mesh.shape:
        return NamedSharding(mesh, P((DCN_AXIS, DP_AXIS)))
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, tp_enabled: bool) -> P:
    """Megatron-style specs: column-parallel up-projections, row-parallel
    down-projections; everything else replicated."""
    if not tp_enabled:
        return P()
    if "embedding/embedding" in path:
        return P(None, TP_AXIS)
    if any(f"{m}/{proj}/kernel" in path for m in ("self_attn", "cross_attn") for proj in ("q", "k", "v")):
        return P(None, TP_AXIS)
    if any(f"{m}/out/kernel" in path for m in ("self_attn", "cross_attn")):
        return P(TP_AXIS, None)
    if "ff/fc1/kernel" in path:
        return P(None, TP_AXIS)
    if "ff/fc2/kernel" in path:
        return P(TP_AXIS, None)
    if path.endswith("fc/kernel"):
        return P(None, TP_AXIS)
    return P()


def train_state_shardings(mesh: Mesh, state):
    """Sharding tree for a full ``TrainState``: params via
    ``param_shardings``, the Adam ``mu``/``nu`` mirror the param tree,
    every other leaf (counts, lr, step) replicated.  This is what actually
    materializes the TP rules — device_put'ing the state with it (and
    letting jit propagate) is the whole application step."""
    p_shard = param_shardings(mesh, state.params)
    rep = replicated(mesh)
    adam_state, scale_state = state.opt_state
    opt_shard = (
        adam_state._replace(count=rep, mu=p_shard, nu=p_shard),
        jax.tree.map(lambda _: rep, scale_state),
    )
    return type(state)(
        params=p_shard, opt_state=opt_shard, step=rep, lr=rep
    )


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for a parameter pytree."""
    tp_enabled = mesh.shape.get(TP_AXIS, 1) > 1

    def assign(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _param_spec(path_str, tp_enabled)
        # only shard leaves whose rank fits the spec and whose sharded dims
        # divide evenly by the mesh axis (e.g. the (d, vocab=309) logit
        # kernel stays replicated on tp=2)
        if any(a is not None for a in spec):
            if leaf.ndim < len(spec):
                spec = P()
            else:
                for dim, axis in enumerate(spec):
                    if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                        spec = P()
                        break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
