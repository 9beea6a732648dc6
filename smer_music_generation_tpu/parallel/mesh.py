"""Device mesh + sharding rules (DP primary, TP optional).

The reference has no distributed runtime at all (SURVEY.md §2.5); the
capability-equivalent TPU scale-out is:

* a ``jax.sharding.Mesh`` over ICI with axes ``("dp", "tp")``;
* data parallelism as the load-bearing strategy (the flagship model is
  4+4 layers x d512 — far under one chip's HBM): batch sharded on ``dp``,
  params replicated, XLA inserts the gradient ``psum`` over ICI;
* an optional tensor-parallel rule set for the FFN / attention projections
  and the (vocab, d) embedding/logit matrices, demonstrating Megatron-style
  column/row sharding under pjit for scale-up variants.

Ring-attention / sequence parallelism is intentionally out of scope: the
reference's max sequence is 2400 tokens (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    if n_devices % tp != 0:
        raise ValueError(f"{n_devices} devices not divisible by tp={tp}")
    return Mesh(devices.reshape(n_devices // tp, tp), (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate over tp."""
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
