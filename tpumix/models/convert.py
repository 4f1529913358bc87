"""Checkpoint conversion between the reference's torch layout and tpumix Flax
params.

The reference ships no weights in-repo (its checkpoint paths point at the
author's workstation, e.g. reference inference_utils.py:156), so conversion is
keyed purely on the documented ``state_dict`` naming scheme:

    conv_b{i}.conv.{weight,bias}        conv_b{i}.batch_norm.{weight,bias,
                                        running_mean,running_var}
    conv_head{i}.{weight,bias}          fc_head{i}.{weight,bias}

(reference model_scalar_1s.py:211-232).  Layout maps:
* conv kernels: torch ``[out, in, kh, kw]`` <-> flax ``[kh, kw, in, out]``
* dense kernels: torch ``[out, in]`` <-> flax ``[in, out]``; the head flatten
  order coincides between NCHW and NHWC because the head conv has a single
  output channel (tpumix/models/blocks.py ScalarHead docstring)
* BatchNorm: weight->scale, bias->bias, running_mean->mean, running_var->var

Works on plain dict state_dicts (torch not required to import this module;
``torch.load`` output tensors are converted via numpy).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def torch_scalar_to_flax(state_dict: Mapping[str, Any], num_blocks: int = 5,
                         num_heads: int = 4) -> Tuple[Dict, Dict]:
    """Reference scalar-model state_dict -> (params, batch_stats) for
    MixingModelScalar1s/2s."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, num_blocks + 1):
        blk = f"conv_b{i}"
        params[blk] = {
            "conv": {
                "kernel": _np(state_dict[f"{blk}.conv.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"{blk}.conv.bias"]),
            },
            "bn": {
                "scale": _np(state_dict[f"{blk}.batch_norm.weight"]),
                "bias": _np(state_dict[f"{blk}.batch_norm.bias"]),
            },
        }
        stats[blk] = {
            "bn": {
                "mean": _np(state_dict[f"{blk}.batch_norm.running_mean"]),
                "var": _np(state_dict[f"{blk}.batch_norm.running_var"]),
            }
        }
    for i in range(1, num_heads + 1):
        params[f"head{i}"] = {
            "conv": {
                "kernel": _np(state_dict[f"conv_head{i}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"conv_head{i}.bias"]),
            },
            "fc": {
                "kernel": _np(state_dict[f"fc_head{i}.weight"]).T,
                "bias": _np(state_dict[f"fc_head{i}.bias"]),
            },
        }
    return params, stats


def flax_scalar_to_torch(params: Mapping[str, Any], batch_stats: Mapping[str, Any],
                         num_blocks: int = 5, num_heads: int = 4) -> Dict[str, np.ndarray]:
    """Inverse map (numpy arrays; load with torch via
    ``{k: torch.from_numpy(v) for ...}``)."""
    sd: Dict[str, np.ndarray] = {}
    for i in range(1, num_blocks + 1):
        blk = f"conv_b{i}"
        sd[f"{blk}.conv.weight"] = np.ascontiguousarray(
            _np(params[blk]["conv"]["kernel"]).transpose(3, 2, 0, 1)
        )
        sd[f"{blk}.conv.bias"] = _np(params[blk]["conv"]["bias"])
        sd[f"{blk}.batch_norm.weight"] = _np(params[blk]["bn"]["scale"])
        sd[f"{blk}.batch_norm.bias"] = _np(params[blk]["bn"]["bias"])
        sd[f"{blk}.batch_norm.running_mean"] = _np(batch_stats[blk]["bn"]["mean"])
        sd[f"{blk}.batch_norm.running_var"] = _np(batch_stats[blk]["bn"]["var"])
    for i in range(1, num_heads + 1):
        h = f"head{i}"
        sd[f"conv_head{i}.weight"] = np.ascontiguousarray(
            _np(params[h]["conv"]["kernel"]).transpose(3, 2, 0, 1)
        )
        sd[f"conv_head{i}.bias"] = _np(params[h]["conv"]["bias"])
        sd[f"fc_head{i}.weight"] = np.ascontiguousarray(_np(params[h]["fc"]["kernel"]).T)
        sd[f"fc_head{i}.bias"] = _np(params[h]["fc"]["bias"])
    return sd


def load_torch_checkpoint(path: str):
    """Load a reference ``.pt`` checkpoint file into (params, batch_stats).
    Requires torch at call time only."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return torch_scalar_to_flax(sd)


# --------------------------------------------------------------------------
# Compact npz checkpoints (the in-repo artifact format)
# --------------------------------------------------------------------------
#
# Orbax run directories (tpumix/train/trainer.py) carry the optimiser state
# and OCDBT manifests — the right durable format for resumable training, the
# wrong one for a shipped inference artifact.  npz stores only
# params + batch_stats as flat "params/<path>" arrays: single file,
# numpy-only loading, ~4 MB for the scalar models.


def _flatten(tree: Mapping[str, Any], prefix: str, out: Dict[str, np.ndarray]) -> None:
    for key, val in tree.items():
        path = f"{prefix}/{key}"
        if isinstance(val, Mapping):
            _flatten(val, path, out)
        else:
            out[path] = _np(val)


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, val in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_npz(path: str, params: Mapping[str, Any], batch_stats: Mapping[str, Any]) -> None:
    """Write inference variables as a single compressed .npz file."""
    flat: Dict[str, np.ndarray] = {}
    _flatten(params, "params", flat)
    _flatten(batch_stats or {}, "batch_stats", flat)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Dict[str, Any]:
    """Read an npz checkpoint -> ``{"params": ..., "batch_stats": ...}``
    (the Flax ``variables`` layout SongMixer consumes)."""
    with np.load(path) as z:
        tree = _unflatten({k: z[k] for k in z.files})
    return {"params": tree.get("params", {}), "batch_stats": tree.get("batch_stats", {})}
