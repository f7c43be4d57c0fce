import numpy as np, jax, jax.numpy as jnp
from nerf_slam_tpu.ops import corr, corr_pallas
rng = np.random.RandomState(0)
E, C, H, W = 3, 32, 42, 80
f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
levels = [lv for lv in corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8)]
coords = jnp.asarray((rng.rand(E, H, W, 2) * np.array([W-1., H-1.])).astype(np.float32))
fused = corr_pallas.lookup_pyramid_pallas_nhwc(tuple(levels), coords)
per = jnp.concatenate([corr_pallas.lookup_level_pallas_nhwc(v, coords / (2**l))
                       for l, v in enumerate(levels)], axis=-1)
diff = float(jnp.max(jnp.abs(fused - per)))
print("fused-vs-perlevel max diff on TPU:", diff, fused.shape)
assert diff < 1e-2, diff
print("OK")
