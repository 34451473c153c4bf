"""Validate the COMPILED Pallas deformable-attention kernel on real TPU.

Runs the fused kernel (ops/deform_attn_pallas.py) against the XLA gather
composition (ops/deform_attn.py) at the flagship encoder shapes and at a
small shape, reporting max abs/rel error and per-op timing. This is the
on-hardware counterpart of tests/test_pallas_kernel.py (which runs in
interpret mode on the CPU mesh).

Usage: python tools/check_pallas_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from betrayed_by_captions_tpu.ops.deform_attn import ms_deform_attn
from betrayed_by_captions_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas


def make_inputs(rng, b, shapes, h, d, p, dtype):
    s = sum(hh * ww for hh, ww in shapes)
    value = jnp.asarray(rng.randn(b, s, h, d), dtype)
    locs = jnp.asarray(rng.rand(b, s, h, len(shapes), p, 2) * 1.2 - 0.1, jnp.float32)
    wgts = jax.nn.softmax(
        jnp.asarray(rng.randn(b, s, h, len(shapes) * p), jnp.float32), axis=-1
    ).reshape(b, s, h, len(shapes), p).astype(dtype)
    return value, locs, wgts


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force one real device->host fetch per iter so the axon tunnel can't
    # report completion before compute finishes
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0][(0,) * out.ndim]))
    return (time.perf_counter() - t0) / iters, out


def check(name, b, shapes, h=8, d=32, p=4, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    value, locs, wgts = make_inputs(rng, b, shapes, h, d, p, dtype)
    xla = jax.jit(lambda v, l, w: ms_deform_attn(v, shapes, l, w))
    pallas = jax.jit(lambda v, l, w: ms_deform_attn_pallas(v, shapes, l, w))

    t_xla, out_xla = bench(xla, value, locs, wgts)
    try:
        t_pl, out_pl = bench(pallas, value, locs, wgts)
    except Exception as e:
        print(f"[{name}] Pallas FAILED: {type(e).__name__}: {str(e)[:500]}")
        return False

    a = np.asarray(out_xla, np.float32)
    bb = np.asarray(out_pl, np.float32)
    err = np.abs(a - bb).max()
    rel = err / max(np.abs(a).max(), 1e-6)
    print(
        f"[{name}] dtype={dtype.__name__} max_abs_err={err:.3e} rel={rel:.3e} "
        f"xla={t_xla * 1000:.2f}ms pallas={t_pl * 1000:.2f}ms "
        f"speedup={t_xla / t_pl:.2f}x"
    )
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
    return rel < tol


def main():
    print("devices:", jax.devices())
    ok = True
    ok &= check("small", 2, [(8, 12), (16, 24)], h=4, d=32, p=4)
    flagship = [(25, 42), (50, 84), (100, 168)]
    ok &= check("flagship-f32", 4, flagship, dtype=jnp.float32)
    ok &= check("flagship-bf16", 4, flagship, dtype=jnp.bfloat16)
    print("OK" if ok else "MISMATCH/FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
