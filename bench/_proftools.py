"""Shared timing helpers that defeat the remote-tunnel result cache:
inputs vary every call, outputs reduce to one scalar INSIDE the jit
(so big results never accumulate on device), and synchronization pulls
a single scalar per batch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sumsq(out):
    acc = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        acc = acc + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return acc


def timeit(name, fn, make_args, reps=8):
    """fn(*make_args(i)); make_args(i) must return DIFFERENT device
    values per i (the tunnel dedupes identical (executable, args) runs
    and its block_until_ready does not force remote execution)."""
    red = jax.jit(lambda *a: _sumsq(fn(*a)))

    float(red(*make_args(-1)))          # compile + warm
    args = [make_args(i) for i in range(reps)]
    for a in args:
        jax.block_until_ready(a)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(reps):
        acc = acc + red(*args[i])
    float(acc)                          # ONE sync for the whole batch
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:>32s}: {dt:8.3f} ms", flush=True)
    return dt
