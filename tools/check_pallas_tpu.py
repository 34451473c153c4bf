"""Validate the COMPILED windowed deformable-attention kernel on real TPU.

Runs the fused Pallas kernel (ops/deform_attn_windowed_pallas.py) against
the exact XLA gather composition (ops/deform_attn.py) at the flagship
encoder shapes and at a small shape, reporting max relative error and
per-op timing (min over reps — the axon tunnel has multi-second stall
outliers). This is the on-hardware counterpart of
tests/test_deform_windowed.py (which runs in interpret mode on CPU).

Usage: python tools/check_pallas_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from betrayed_by_captions_tpu.models.deformable import make_reference_points
from betrayed_by_captions_tpu.ops.deform_attn import ms_deform_attn
from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
    windowed_ms_deform_attn_pallas,
)

NH, D, P = 8, 32, 4
# int or comma tuple ('8,6,4' = per-value-level mixed windows)
_wspec = os.environ.get("CHECK_WINDOW", "6")
W = (
    int(_wspec)
    if "," not in _wspec
    else tuple(int(x) for x in _wspec.split(","))
)


def make_inputs(rng, b, shapes, dtype):
    s = sum(hh * ww for hh, ww in shapes)
    nl = len(shapes)
    ref = make_reference_points(shapes)
    # keep offsets inside each level's window clamp (W_l/2 - 1 cells) so
    # the exact gather op (which never clamps) computes the same samples
    wins = (W,) * nl if isinstance(W, int) else W
    lim = np.asarray([wl / 2 - 1 - 0.05 for wl in wins], np.float32)
    lim = lim.reshape(1, 1, 1, nl, 1, 1)
    offs = rng.uniform(-1, 1, size=(b, s, NH, nl, P, 2)).astype(
        np.float32
    ) * lim
    norm = np.array([[ww, hh] for (hh, ww) in shapes], np.float32)
    locs = jnp.asarray(
        ref[None, :, None, None, None, :]
        + offs / norm[None, None, None, :, None, :]
    )
    wgts = rng.rand(b, s, NH, nl, P).astype(np.float32)
    wgts = wgts / wgts.sum(axis=(3, 4), keepdims=True)
    value = jnp.asarray(rng.randn(b, s, NH, D), dtype)
    return value, locs, jnp.asarray(wgts, dtype)


def bench(fn, *args, reps=7, chain=5):
    """min over reps of (chain dispatches + one sync) / chain: device-side
    queueing amortizes the tunnel's ~30ms round-trip latency out of the
    measurement (a per-rep readback would swamp small kernels)."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    return min(times), out


def check(name, b, shapes, dtype=jnp.bfloat16, variants=("cell", "packed", "merged")):
    rng = np.random.RandomState(0)
    value, locs, wgts = make_inputs(rng, b, shapes, dtype)
    exact = jax.jit(
        lambda v, l, w: ms_deform_attn(
            v.astype(jnp.float32), shapes, l, w.astype(jnp.float32)
        )
    )
    t_exact, out_exact = bench(exact, value, locs, wgts, reps=3)
    a = np.asarray(out_exact, np.float32)

    ok = True
    for variant in variants:
        pallas = jax.jit(
            lambda v, l, w, _var=variant: windowed_ms_deform_attn_pallas(
                v, shapes, l, w, window=W, variant=_var
            )
        )
        try:
            t_pl, out_pl = bench(pallas, value, locs, wgts)
        except Exception as e:
            print(
                f"[{name}/{variant}] Pallas FAILED: "
                f"{type(e).__name__}: {str(e)[:500]}"
            )
            ok = False
            continue
        bb = np.asarray(out_pl, np.float32)
        rel = np.abs(a - bb).max() / max(np.abs(a).max(), 1e-6)
        print(
            f"[{name}/{variant}] rel_err={rel:.3e} "
            f"exact={t_exact * 1000:.2f}ms "
            f"pallas={t_pl * 1000:.2f}ms speedup={t_exact / t_pl:.1f}x"
        )
        ok &= rel < 2e-2
    return ok


def check_layernorm():
    """On-chip numerics of the fused channels-major LayerNorm
    (ops/layernorm_pallas.py) vs the f32 moment chain.  The kernel has
    passed compile probes on-chip since the f806f0b Mosaic lane-reshape
    fix but never a hardware numerics check (interpret mode passed) —
    and NEXT.md 6b suspects it in the round-4 resume loss discontinuity.
    CHECK_LN=0 skips (e.g. on slow-tunnel days where even these small
    compiles blow the session budget)."""
    if os.environ.get("CHECK_LN", "1") == "0":
        return True
    from betrayed_by_captions_tpu.ops.layernorm_pallas import layernorm_cm

    rng = np.random.RandomState(0)
    ok = True
    # flagship stride-8 channels-major shape + an odd-lane small shape
    # (the lane-reshape fix's edge case)
    for shp in [(2, 256, 100, 168), (1, 32, 11, 7)]:
        x = jnp.asarray(rng.randn(*shp) * 3 + 1, jnp.bfloat16)
        s = jnp.asarray(rng.rand(shp[1]) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(shp[1]), jnp.float32)
        got = np.asarray(jax.jit(layernorm_cm)(x, s, b), np.float32)
        xf = np.asarray(x, np.float32)
        mu = xf.mean(1, keepdims=True)
        var = xf.var(1, keepdims=True)
        want = (xf - mu) / np.sqrt(var + 1e-5)  # kernel default eps
        want = want * np.asarray(s)[None, :, None, None]
        want = want + np.asarray(b)[None, :, None, None]
        # elementwise relative error with a denominator floor (a global-
        # max denominator would underweight errors where |want| is small)
        rel = float(
            (np.abs(got - want) / np.maximum(np.abs(want), 0.5)).max()
        )
        good = rel < 2e-2  # bf16 inputs: ~1e-2 is the rounding floor
        ok &= good
        print(f"layernorm_cm {shp}: max_rel_err {rel:.2e} "
              f"{'ok' if good else 'MISMATCH'}")
    return ok


def main():
    print("devices:", jax.devices(), "window:", W)
    # CHECK_VARIANTS trims the kernel-variant sweep (each variant is a
    # fresh Mosaic compile — ~2-7 min each through the remote-compile
    # helper on slow-tunnel days; 'merged' alone validates the shipped
    # path).  CHECK_SMALL=0 skips the small-shape case.
    variants = tuple(
        os.environ.get("CHECK_VARIANTS", "cell,packed,merged").split(",")
    )
    ok = True
    if os.environ.get("CHECK_SMALL", "1") != "0":
        ok &= check(
            "small", 2, [(4, 6), (8, 12), (16, 24)], variants=variants
        )
    ok &= check(
        "flagship", 4, [(25, 42), (50, 84), (100, 168)], variants=variants
    )
    ok &= check_layernorm()
    print("OK" if ok else "MISMATCH/FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
