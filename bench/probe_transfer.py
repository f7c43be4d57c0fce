"""Probe the tunneled chip's H2D transfer behavior.

Answers three questions that decide whether frame uploads can be hidden
behind compute (the production pipeline pays ~70 ms/frame of ingest):
  1. is jax.device_put async (returns before the copy lands)?
  2. does an upload overlap an in-flight jit from the same thread?
  3. can a second thread upload while the first dispatches (the axon
     client historically deadlocked on concurrent jit dispatch -- is a
     concurrent TRANSFER safe)?

Run from the repo root: python bench/probe_transfer.py
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    img = np.random.randint(0, 255, (336, 640, 3), np.uint8)
    big = np.random.rand(1024, 1024).astype(np.float32)

    # warm the transfer path + a ~100ms compute kernel
    jax.block_until_ready(jnp.asarray(img))
    w = jnp.asarray(big)

    @jax.jit
    def burn(x):
        for _ in range(60):
            x = x @ x * 1e-3 + x
        return x

    jax.block_until_ready(burn(w))

    # 1. enqueue vs landed
    for trial in range(3):
        t0 = time.perf_counter()
        a = jnp.asarray(img)
        t_enq = time.perf_counter() - t0
        jax.block_until_ready(a)
        t_land = time.perf_counter() - t0
        print(f"upload 645KB: enqueue {t_enq*1e3:7.2f} ms, "
              f"landed {t_land*1e3:7.2f} ms", flush=True)

    # 2. same-thread overlap: dispatch compute, then upload, then sync
    t0 = time.perf_counter()
    out = burn(w)
    a = jnp.asarray(img)
    jax.block_until_ready((out, a))
    t_inter = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = burn(w)
    jax.block_until_ready(out)
    t_burn = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = jnp.asarray(img)
    jax.block_until_ready(a)
    t_up = time.perf_counter() - t0
    print(f"compute {t_burn*1e3:.1f} ms, upload {t_up*1e3:.1f} ms, "
          f"interleaved {t_inter*1e3:.1f} ms "
          f"(overlap saves {(t_burn+t_up-t_inter)*1e3:.1f} ms)",
          flush=True)

    # 3. concurrent thread upload during dispatch (deadlock probe with a
    # watchdog; uploads ride a lock-free path if this passes)
    done = {"t": None}

    def uploader():
        t0 = time.perf_counter()
        for _ in range(5):
            jax.block_until_ready(jnp.asarray(img))
        done["t"] = time.perf_counter() - t0

    th = threading.Thread(target=uploader, daemon=True)
    t0 = time.perf_counter()
    th.start()
    for _ in range(5):
        out = burn(w)
        jax.block_until_ready(out)
    th.join(timeout=30.0)
    if th.is_alive():
        print("concurrent upload DEADLOCKED (keep uploads under "
              "DEVICE_LOCK)", flush=True)
        os._exit(1)
    print(f"concurrent: 5 uploads ({done['t']*1e3:.0f} ms) alongside "
          f"5 computes, total {(time.perf_counter()-t0)*1e3:.0f} ms — "
          "no deadlock", flush=True)


if __name__ == "__main__":
    main()
