"""Micro-bench: channels-major dense-projection formulations on TPU.

The round-5 pixel-decoder trace (tools/trace_pixdec.py) shows the
DenseCM einsum ``bc...,cf->bf...`` lowering as VPU loop fusions
(~0.33 ms per 2.2-GFLOP projection, ~3% MFU, ~32 ms/iter across the
encoder). This tool times candidate formulations at the flagship
stride-8 shape to pick one that lowers as a real MXU dot.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from betrayed_by_captions_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


CHAIN = 400  # tunnel fetch round-trip is ~40 ms; amortize it away


def chain(fn):
    """Run fn CHAIN times with a data dependency (axon block_until_ready
    does not force completion; fetching one element of a chained result
    does — see PERF.md measurement gotchas)."""

    @jax.jit
    def go(x, k):
        def body(_, x):
            return fn(x, k)

        return jax.lax.fori_loop(0, CHAIN, body, x)

    return go


def timeit(fn, x, k, reps=6):
    go = chain(fn)
    out = go(x, k)
    np.asarray(jax.device_get(out[(0,) * out.ndim]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = go(x, k)
        np.asarray(jax.device_get(out[(0,) * out.ndim]))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--shape", type=int, nargs=2, default=(100, 168))
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    args = ap.parse_args()

    b, (eh, ew) = args.batch, args.shape
    cin, cout = args.cin, args.cout
    rng = np.random.RandomState(0)
    x_bchw = jnp.asarray(rng.randn(b, cin, eh, ew) * 0.1, jnp.bfloat16)
    x_cbhw = jnp.asarray(rng.randn(cin, b, eh, ew) * 0.1, jnp.bfloat16)
    x_bhwc = jnp.asarray(rng.randn(b, eh, ew, cin) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(cin, cout) * 0.1, jnp.bfloat16)

    flops = 2 * b * eh * ew * cin * cout

    @jax.jit
    def v0_einsum_bchw(x, k):  # current DenseCM
        return jnp.einsum("bc...,cf->bf...", x, k)

    @jax.jit
    def v1_dot_bcs(x, k):  # explicit dot_general, batch-major
        y = x.reshape(b, cin, eh * ew)
        y = jax.lax.dot_general(
            k, y, (((0,), (1,)), ((), ())), preferred_element_type=jnp.bfloat16
        )  # (cout, b, s)
        return jnp.transpose(y, (1, 0, 2)).reshape(b, cout, eh, ew)

    @jax.jit
    def v2_channel_outer(x, k):  # resident layout (C, B, eh, ew)
        y = x.reshape(cin, b * eh * ew)
        y = jax.lax.dot_general(
            k, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
        )
        return y.reshape(cout, b, eh, ew)

    @jax.jit
    def v3_nhwc(x, k):  # token/NHWC layout reference point
        return x @ k

    @jax.jit
    def v0_f32acc(x, k):
        return jnp.einsum(
            "bc...,cf->bf...", x, k, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    for name, fn, xx in [
        ("v0 einsum (B,C,h,w) [current]", v0_einsum_bchw, x_bchw),
        ("v0f einsum f32-acc", v0_f32acc, x_bchw),
        ("v1 dot_general (B,C,S)->T", v1_dot_bcs, x_bchw),
        ("v2 channel-outer (C,B,h,w)", v2_channel_outer, x_cbhw),
        ("v3 NHWC x@k", v3_nhwc, x_bhwc),
    ]:
        dt = timeit(fn, xx, k)
        print(
            f"{name:34s} {dt * 1e3:8.3f} ms  "
            f"{flops / dt / 1e12:6.1f} TFLOP/s"
        )


if __name__ == "__main__":
    main()
