"""Convert reference PyTorch checkpoints to this framework's parameters.

The reference trains with torch and saves ``{'model_state_dict',
'optimizer_state_dict', 'epoch', 'loss'}`` per epoch
(``train.py:967-973``); its evaluation loads ``checkpoint_9``
(``evaluation.py:1584-1607``).  A user migrating from the reference brings
such a file; this module maps it onto the flax ``ScoreTransformer``
parameter tree so trained models serve on TPU without retraining.

Name mapping (reference ``model.py:59-106`` + its ``transformer.py`` fork
of ``torch.nn.Transformer``):

  embedding.weight                                -> embedding/embedding
  fc.{weight,bias}                                -> fc (kernel transposed)
  transformer.encoder.layers.{i}.self_attn.*      -> encoder_{i}/self_attn
  transformer.encoder.layers.{i}.linear{1,2}.*    -> encoder_{i}/ff/fc{1,2}
  transformer.encoder.layers.{i}.norm{1,2}.*      -> encoder_{i}/norm{1,2}
  transformer.encoder.norm.*                      -> norm_e   (final LN)
  transformer.decoder.layers.{i}.self_attn.*      -> decoder_{i}/self_attn
  transformer.decoder.layers.{i}.multihead_attn.* -> decoder_{i}/cross_attn
  transformer.decoder.layers.{i}.linear{1,2}.*    -> decoder_{i}/ff/fc{1,2}
  transformer.decoder.layers.{i}.norm{1,2,3}.*    -> decoder_{i}/norm{1,2,3}
  transformer.decoder.norm.*                      -> norm_d   (final LN)

torch ``Linear.weight`` is (out, in) and flax ``Dense.kernel`` is
(in, out), so every matmul weight transposes; torch
``MultiheadAttention.in_proj_weight`` is the (3D, D) concatenation of the
q/k/v projections.  The optimizer state is NOT converted (torch Adam
moments are keyed by parameter order; resuming training re-warms optax
state — the model weights are the artifact that matters).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from ..models.transformer import ModelConfig


def _np(x: Any) -> np.ndarray:
    """torch.Tensor | array-like -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _attention(sd: Mapping[str, Any], prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    w = _np(sd[f"{prefix}.in_proj_weight"])  # (3D, D)
    b = _np(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    return {
        "q": {"kernel": w[:d].T, "bias": b[:d]},
        "k": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
        "v": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
        "out": {
            "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T,
            "bias": _np(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _count_layers(sd: Mapping[str, Any], stack: str) -> int:
    n = 0
    while f"transformer.{stack}.layers.{n}.norm1.weight" in sd:
        n += 1
    return n


def infer_config(
    sd: Mapping[str, Any],
    nhead: Optional[int] = None,
    max_len: int = 2400,
    dtype=None,
) -> ModelConfig:
    """Infer the architecture from checkpoint shapes.

    ``nhead`` is not recoverable from shapes; the default follows the
    reference's head-width convention (64-dim heads: d512->8, d256->4,
    matching ``config/config.yaml:33`` / ``train.py:159``).
    """
    import jax.numpy as jnp

    vocab_size, d_model = _np(sd["embedding.weight"]).shape
    d_ff = _np(sd["transformer.encoder.layers.0.linear1.weight"]).shape[0]
    return ModelConfig(
        vocab_size=int(vocab_size),
        d_model=int(d_model),
        nhead=int(nhead) if nhead else max(1, d_model // 64),
        num_encoder_layers=_count_layers(sd, "encoder"),
        num_decoder_layers=_count_layers(sd, "decoder"),
        d_ff=int(d_ff),
        max_len=max_len,
        dtype=dtype if dtype is not None else jnp.float32,
        final_norm="transformer.decoder.norm.weight" in sd,
    )


def torch_state_dict_to_params(
    sd: Mapping[str, Any], cfg: Optional[ModelConfig] = None
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Map a reference ``model_state_dict`` onto the flax parameter tree.

    Returns ``(cfg, {"params": tree})`` ready for
    ``ScoreTransformer(cfg).apply``.
    """
    if cfg is None:
        cfg = infer_config(sd)
    tree: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["embedding.weight"])},
        "fc": _linear(sd, "fc"),
    }
    for i in range(cfg.num_encoder_layers):
        p = f"transformer.encoder.layers.{i}"
        tree[f"encoder_{i}"] = {
            "self_attn": _attention(sd, f"{p}.self_attn"),
            "ff": {
                "fc1": _linear(sd, f"{p}.linear1"),
                "fc2": _linear(sd, f"{p}.linear2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    for i in range(cfg.num_decoder_layers):
        p = f"transformer.decoder.layers.{i}"
        tree[f"decoder_{i}"] = {
            "self_attn": _attention(sd, f"{p}.self_attn"),
            "cross_attn": _attention(sd, f"{p}.multihead_attn"),
            "ff": {
                "fc1": _linear(sd, f"{p}.linear1"),
                "fc2": _linear(sd, f"{p}.linear2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
        }
    if cfg.final_norm:
        tree["norm_e"] = _layernorm(sd, "transformer.encoder.norm")
        tree["norm_d"] = _layernorm(sd, "transformer.decoder.norm")
    return cfg, {"params": tree}


def load_torch_checkpoint(
    path: str, nhead: Optional[int] = None, max_len: int = 2400, dtype=None
) -> Tuple[ModelConfig, Dict[str, Any], Dict[str, Any]]:
    """Load a reference ``torch.save`` checkpoint file.

    Accepts both the training payload (``{'model_state_dict': ...}``,
    ``train.py:967-973``) and a bare state dict.  Returns
    ``(cfg, params, meta)`` where meta carries epoch/loss when present.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    sd = payload.get("model_state_dict", payload)
    meta = {
        k: payload[k] for k in ("epoch", "loss") if isinstance(payload, dict) and k in payload
    }
    cfg = infer_config(sd, nhead=nhead, max_len=max_len, dtype=dtype)
    cfg, params = torch_state_dict_to_params(sd, cfg)
    return cfg, params, meta


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to an orbax "
        "checkpoint loadable by this framework."
    )
    ap.add_argument("checkpoint", help="reference torch checkpoint (.pt/.pth)")
    ap.add_argument("out_dir", help="output directory for the orbax checkpoint")
    ap.add_argument("--nhead", type=int, default=None,
                    help="attention heads (default: d_model // 64)")
    ap.add_argument("--max-len", type=int, default=2400)
    args = ap.parse_args(argv)

    from .checkpoint import save_checkpoint
    from .state import TrainState

    cfg, params, meta = load_torch_checkpoint(
        args.checkpoint, nhead=args.nhead, max_len=args.max_len
    )
    import jax

    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    state = TrainState.create(params, lr=1e-4)
    epoch = int(meta.get("epoch", 0))
    loss = float(meta.get("loss", 0.0))
    path = save_checkpoint(args.out_dir, epoch, state, loss)
    print(
        f"converted {args.checkpoint} -> {path} "
        f"(d_model={cfg.d_model}, nhead={cfg.nhead}, "
        f"layers={cfg.num_encoder_layers}+{cfg.num_decoder_layers}, "
        f"vocab={cfg.vocab_size}, final_norm={cfg.final_norm})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
