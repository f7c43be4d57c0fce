import numpy as np, jax, jax.numpy as jnp
from nerf_slam_tpu.ops import corr_pallas
rng = np.random.RandomState(0)
E, H1, W1, H2, W2 = 2, 4, 16, 16, 11   # H2 % 8 == 0 -> grouped path
vol = jnp.asarray(rng.randn(E, H1, W1, H2, W2).astype(np.float32)).astype(jnp.bfloat16)
coords = jnp.asarray((rng.rand(E, H1, W1, 2) * np.array([W2-1., H2-1.])).astype(np.float32))
a = corr_pallas.lookup_level_pallas_grouped_nhwc(vol, coords)
b = corr_pallas.lookup_level_pallas_nhwc(vol, coords)
diff = float(jnp.max(jnp.abs(a - b)))
print("grouped-vs-perpixel max diff on TPU:", diff, a.shape)
assert diff < 1e-2, diff
print("OK")
