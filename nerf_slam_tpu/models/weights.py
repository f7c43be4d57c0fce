"""Pretrained-weight conversion: DROID ``droid.pth`` -> flax params.

Replicates the reference's key remapping and weight-head truncation
(/root/reference/slam/visual_frontends/visual_frontend.py:1051-1068):
``module.``/``fnet.``/``cnet.``/``update.`` prefixes are normalized and the
delta/weight head output channels are truncated to 2.

Conv weights transpose from torch OIHW to flax HWIO.  Instance/none norms
carry no parameters, so the full droid.pth maps onto conv kernels/biases
only.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def normalize_keys(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        k = k.replace("module.", "")
        k = k.replace("fnet.", "feature_net.")
        k = k.replace("cnet.", "context_net.")
        if k.startswith("update."):
            k = k.replace("update.", "update_net.", 1)
        out[k] = np.asarray(v)
    # truncate flow-delta / weight heads to 2 channels
    for head in ("update_net.weight.2", "update_net.delta.2"):
        wk, bk = head + ".weight", head + ".bias"
        if wk in out:
            out[wk] = out[wk][:2]
            out[bk] = out[bk][:2]
    return out


# torch module path -> flax module path (within params['params'])
_SEQ_RENAMES = [
    (re.compile(r"^(feature_net|context_net)\.layer(\d)\.(\d)\."),
     r"\1.layer\2_\3."),
    (re.compile(r"\.downsample\.0\."), ".downsample."),
    (re.compile(r"^update_net\.(corr_encoder|flow_encoder|weight|delta)"
                r"\.(\d)\."), r"update_net.\1_\2."),
    (re.compile(r"^update_net\.agg\.(eta|upmask)\.0\."),
     r"update_net.agg.\1_0."),
]


def torch_key_to_flax_path(key: str):
    """'feature_net.layer1.0.conv1.weight' ->
    (['feature_net', 'layer1_0', 'conv1'], 'kernel')"""
    for pat, rep in _SEQ_RENAMES:
        key = pat.sub(rep, key)
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "weight":
        leaf = "kernel"
    path = parts[:-1]
    # top-level encoders wrap their convs in the `Conv` name scope used by
    # flax (we name convs directly, no extra scope)
    return path, leaf


def convert(state: Mapping[str, np.ndarray]) -> Dict:
    """Normalized torch state_dict -> nested flax params dict."""
    state = normalize_keys(state)
    params: Dict = {}
    for k, v in state.items():
        path, leaf = torch_key_to_flax_path(k)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        if leaf == "kernel" and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        node[leaf] = jnp.asarray(v, dtype=jnp.float32)
    return {"params": params}


def load_droid_pth(path: str) -> Dict:
    """Load a droid.pth checkpoint (requires torch, CPU-only)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return convert({k: v.numpy() for k, v in sd.items()})
