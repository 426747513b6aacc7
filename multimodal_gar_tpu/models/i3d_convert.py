"""Convert torch I3D (Kinetics ``rgb_imagenet.pt``-style) weights to Flax.

The reference loads Kinetics-pretrained I3D weights into its torch backbone
(gat_model.py:987-991). This converter maps that checkpoint's state-dict
naming onto our Flax InceptionI3d tree:

  torch                                   flax
  <EP>.conv3d.weight (O,I,kt,kh,kw)   ->  params[<EP>]['conv3d']['kernel']
                                          (kt,kh,kw,I,O)
  <EP>.bn.{weight,bias}               ->  params[<EP>]['bn']{scale,bias}
  <EP>.bn.running_{mean,var}          ->  batch_stats[<EP>]['bn']{mean,var}
  Mixed_*.{b0,b1a,b1b,b2a,b2b,b3b}.*  ->  nested the same way

Usage: variables = load_i3d_checkpoint(variables, path_or_state_dict)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple, Union

import numpy as np


def _split_key(name: str):
    """'Mixed_4f.b1a.conv3d.weight' -> (['Mixed_4f', 'b1a'], 'conv3d', 'weight')"""
    parts = name.split(".")
    return parts[:-2], parts[-2], parts[-1]


# leaves the converter deliberately ignores (torch BN bookkeeping buffers)
IGNORED_LEAVES = ("num_batches_tracked",)


def unconsumed_keys(state_dict: Mapping[str, Any]) -> list:
    """Checkpoint keys convert_state_dict neither maps nor deliberately
    ignores — non-empty means the checkpoint contains naming this converter
    does not understand (the key-manifest guard, tested against the
    published rgb_imagenet.pt key list in tests/test_converter_manifests.py).
    """
    out = []
    for name in state_dict:
        _scope, layer, leaf = _split_key(name)
        if leaf in IGNORED_LEAVES:
            continue
        if layer == "conv3d" and leaf in ("weight", "bias"):
            continue
        if layer == "bn" and leaf in ("weight", "bias", "running_mean",
                                      "running_var"):
            continue
        out.append(name)
    return out


def convert_state_dict(state_dict: Mapping[str, Any]
                       ) -> Tuple[Dict, Dict]:
    """torch state dict -> (params overlay, batch_stats overlay)."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for name, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "numpy", lambda: tensor)())
        scope, layer, leaf = _split_key(name)
        if layer == "conv3d":
            if leaf == "weight":
                put(params, scope + ["conv3d"], "kernel",
                    arr.transpose(2, 3, 4, 1, 0))
            elif leaf == "bias":
                put(params, scope + ["conv3d"], "bias", arr)
        elif layer == "bn":
            if leaf == "weight":
                put(params, scope + ["bn"], "scale", arr)
            elif leaf == "bias":
                put(params, scope + ["bn"], "bias", arr)
            elif leaf == "running_mean":
                put(stats, scope + ["bn"], "mean", arr)
            elif leaf == "running_var":
                put(stats, scope + ["bn"], "var", arr)
        # logits / end-layer weights are dropped: we build to Mixed_4f.
    return params, stats


def _overlay(dst: Dict, src: Dict, path="") -> int:
    """Recursively copy src leaves into dst where keys+shapes match.

    Returns the number of leaves copied; raises on shape mismatch.
    """
    n = 0
    for k, v in src.items():
        if k not in dst:
            continue                      # extra torch layer (e.g. deeper EP)
        if isinstance(v, dict):
            n += _overlay(dst[k], v, f"{path}/{k}")
        else:
            cur = dst[k]
            if tuple(cur.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: {cur.shape} vs {v.shape}")
            dst[k] = v.astype(np.asarray(cur).dtype)
            n += 1
    return n


def load_i3d_checkpoint(variables: Dict, checkpoint: Union[str, Mapping],
                        scope: str = "rgb_backbone") -> Dict:
    """Overlay converted I3D weights into a model's variables pytree.

    Args:
      variables: flax variables {'params': ..., 'batch_stats': ...}.
      checkpoint: path to a torch .pt file or an in-memory state dict.
      scope: submodule holding the i3d (params[scope]['i3d']).
    """
    import jax

    if isinstance(checkpoint, str):
        import torch
        state = torch.load(checkpoint, map_location="cpu")
    else:
        state = checkpoint
    p_over, s_over = convert_state_dict(state)

    variables = jax.tree_util.tree_map(np.asarray, variables)

    def to_mutable(d):
        return {k: to_mutable(v) for k, v in d.items()} if isinstance(d, dict) \
            else d

    tree = to_mutable({"params": dict(variables["params"]),
                       "batch_stats": dict(variables.get("batch_stats", {}))})
    target_p = tree["params"]
    target_s = tree["batch_stats"]
    if scope:
        target_p = target_p[scope]
        target_s = target_s[scope]
    n1 = _overlay(target_p["i3d"], p_over)
    n2 = _overlay(target_s["i3d"], s_over)
    if n1 == 0:
        raise ValueError("no I3D parameters matched the checkpoint")
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)
