"""Checkpoint / resume for the full SLAM + mapping state.

The reference has no pipeline checkpointing (SURVEY.md section 5); with
JAX everything of value is a pytree of arrays, so a checkpoint is
(keyframe buffers, edge state, graph indices, counters, NGP params +
optimizer state, train set).  Stored as an .npz plus a small JSON
manifest -- dependency-free and fast enough for per-sequence snapshots.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):
        items = tree._asdict().items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("."): tree}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}."))
    return out


def save_arrays(path: str, tree: Any, meta: Dict = None):
    flat = _flatten(tree)
    arrays = {}
    for k, v in flat.items():
        if v is None or not hasattr(v, "shape"):
            continue
        a = np.asarray(v)
        if a.dtype.kind not in "fiub":  # e.g. ml_dtypes bfloat16
            a = np.asarray(jnp.asarray(v).astype(jnp.float32))
        arrays[k] = a
    np.savez_compressed(path, **arrays)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def load_arrays(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    data = dict(np.load(path, allow_pickle=False))
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return data, meta


def unflatten_into(template, flat: Dict[str, np.ndarray], prefix=""):
    """Rebuild a pytree with the template's structure from flat arrays."""
    if isinstance(template, dict):
        return {k: unflatten_into(v, flat, f"{prefix}{k}.")
                for k, v in template.items()}
    if hasattr(template, "_asdict"):
        d = {k: unflatten_into(v, flat, f"{prefix}{k}.")
             for k, v in template._asdict().items()}
        return type(template)(**d)
    if isinstance(template, tuple):
        return tuple(unflatten_into(v, flat, f"{prefix}{i}.")
                     for i, v in enumerate(template))
    if isinstance(template, list):
        return [unflatten_into(v, flat, f"{prefix}{i}.")
                for i, v in enumerate(template)]
    key = prefix.rstrip(".")
    if key in flat:
        dtype = getattr(template, "dtype", None)
        return jnp.asarray(flat[key], dtype=dtype)
    return template


def save_frontend(path: str, frontend) -> None:
    """Snapshot a RaftVisualFrontend (tracking state)."""
    if hasattr(frontend, "_flush_pending"):
        frontend._flush_pending()   # settle lazy edge maintenance
    g = frontend.graph
    meta = {
        "kf_idx": frontend.kf_idx,
        "last_kf_idx": frontend.last_kf_idx,
        "last_k": frontend.last_k,
        "is_initialized": frontend.is_initialized,
        "kf_idx_to_f_idx": {str(k): v for k, v in
                            frontend.kf_idx_to_f_idx.items()},
        "graph": {
            "ii": g.ii.tolist(), "jj": g.jj.tolist(),
            "age": g.age.tolist(),
            "ii_inactive": g.ii_inactive.tolist(),
            "jj_inactive": g.jj_inactive.tolist(),
        },
    }
    save_arrays(path, {"state": frontend.state,
                       "edges": frontend.edges,
                       "inactive": frontend.inactive}, meta)


def load_frontend(path: str, frontend) -> None:
    """Restore into an already-constructed frontend (same config)."""
    flat, meta = load_arrays(path)
    frontend.state = unflatten_into(frontend.state, flat, "state.")
    frontend.edges = unflatten_into(frontend.edges, flat, "edges.")
    frontend.inactive = unflatten_into(frontend.inactive, flat,
                                       "inactive.")
    frontend.kf_idx = meta["kf_idx"]
    frontend.last_kf_idx = meta["last_kf_idx"]
    frontend.last_k = meta["last_k"]
    frontend.is_initialized = meta["is_initialized"]
    frontend.kf_idx_to_f_idx = {int(k): v for k, v in
                                meta["kf_idx_to_f_idx"].items()}
    frontend.f_idx_to_kf_idx = {v: int(k) for k, v in
                                meta["kf_idx_to_f_idx"].items()}
    g = frontend.graph
    gm = meta["graph"]
    g.ii = np.asarray(gm["ii"], np.int64)
    g.jj = np.asarray(gm["jj"], np.int64)
    g.age = np.asarray(gm["age"], np.int64)
    g.ii_inactive = np.asarray(gm["ii_inactive"], np.int64)
    g.jj_inactive = np.asarray(gm["jj_inactive"], np.int64)


def save_nerf(path: str, fusion) -> None:
    """Snapshot a NerfFusion (hash table, MLPs, Adam state, train set)."""
    save_arrays(path, {"params": fusion.params._asdict(),
                       "opt_state": fusion.opt_state,
                       "train_set": fusion.train_set,
                       "pose_deltas": fusion.pose_deltas,
                       "pose_opt_state": fusion.pose_opt_state},
                {"iteration": fusion.iteration})


def load_nerf(path: str, fusion) -> None:
    flat, meta = load_arrays(path)
    from ..fusion.ngp import NGPParams
    fusion.params = NGPParams(
        table=jnp.asarray(flat["params.table"]),
        mlp=unflatten_into(fusion.params.mlp, flat, "params.mlp."))
    fusion.opt_state = unflatten_into(fusion.opt_state, flat,
                                      "opt_state.")
    fusion.train_set = unflatten_into(fusion.train_set, flat,
                                      "train_set.")
    fusion.pose_deltas = unflatten_into(fusion.pose_deltas, flat,
                                        "pose_deltas")
    fusion.pose_opt_state = unflatten_into(fusion.pose_opt_state, flat,
                                           "pose_opt_state.")
    fusion.iteration = meta.get("iteration", 0)
