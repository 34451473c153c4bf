import time
import jax, jax.numpy as jnp, numpy as np
from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import windowed_ms_deform_attn_pallas
from betrayed_by_captions_tpu.models.deformable import make_reference_points

B, NH, D, P = 4, 8, 32, 4
SHAPES = [(25, 42), (50, 84), (100, 168)]
S = sum(h * w for h, w in SHAPES)
rng = np.random.RandomState(0)
ref = make_reference_points(SHAPES)
offs = rng.uniform(-3, 3, size=(B, S, NH, 3, P, 2)).astype(np.float32)
norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
locs = jnp.asarray(ref[None, :, None, None, None, :] + offs / norm[None, None, None, :, None, :])
wgts = rng.rand(B, S, NH, 3, P).astype(np.float32)
wgts = jnp.asarray(wgts / wgts.sum(axis=(3, 4), keepdims=True)).astype(jnp.bfloat16)
value = jnp.asarray(rng.randn(B, S, NH, D), jnp.bfloat16)
op = jax.jit(lambda v, l, w: windowed_ms_deform_attn_pallas(v, SHAPES, l, w, window=8))
out = op(value, locs, wgts); jax.block_until_ready(out)
times = []
for _ in range(9):
    t0 = time.perf_counter()
    out = op(value, locs, wgts)
    np.asarray(jax.device_get(out[0, 0, 0]))
    times.append((time.perf_counter() - t0) * 1000)
ts = sorted(times)
print(f"full op: min={ts[0]:.2f} med={ts[len(ts)//2]:.2f} ms")
