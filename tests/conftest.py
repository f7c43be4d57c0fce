"""Test config: force CPU JAX with 8 virtual devices so sharding tests can
run without TPU hardware (SURVEY.md section 4 rebuild plan).

The harness environment presets JAX_PLATFORMS=axon (a tunneled TPU) and a
startup hook imports jax before any conftest runs, so plain env-var
overrides are too late.  jax.config.update still works as long as no
backend has been initialized, and XLA_FLAGS is read lazily at backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests must NOT share the persistent compile cache with concurrent TPU
# processes (training/bench): a reader hitting a partially-written entry
# aborts the interpreter (observed: Fatal abort in
# compilation_cache.get_executable_and_time during a live training run).
# enable_compilation_cache() honors this env override.
os.environ.setdefault("NERF_SLAM_TPU_NO_CACHE", "1")
# NOTE: x64 stays OFF globally (f32 is the production dtype and 2-4x faster
# on CPU); finite-difference oracle tests opt in locally with
# `with jax.experimental.enable_x64():`.
