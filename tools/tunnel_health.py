#!/usr/bin/env python
"""Axon-tunnel health probe: measure the session's device-link quality.

The TPU arrives through a tunnel whose latency/bandwidth varies wildly
between sessions (PERF.md round-11: a bench invocation that took ~4 min
in round 3 could not finish in 20 min in round 4). Every round-4+
runbook decision — how many bench A/Bs fit, whether a window-study run
is 10 or 40 minutes — hangs on numbers this tool measures in ~1 min:

- ``init_s``: backend init (tunnel handshake) time,
- ``rtt_ms``: small-scalar round-trip latency (dispatch + fetch),
- ``h2d_MBps`` / ``d2h_MBps``: bulk transfer bandwidth (64 MB array),
- ``compile_s``: tiny-kernel compile latency (remote-compile helper),
- ``step_ms``: dispatch-chain throughput for a small matmul loop.

Prints one JSON line; exits 2 if the backend is unreachable. Run it
FIRST in any session runbook and pick the chip schedule accordingly
(e.g. h2d below ~10 MB/s means a bench.py invocation is a cold-run-
sized job no matter how warm the compile cache is).
"""

import json
import sys
import time


def main():
    t0 = time.perf_counter()
    try:
        import jax
        import jax.numpy as jnp

        dev = jax.devices()[0]
    except Exception as e:  # backend init failed — report, don't trace
        print(json.dumps({"ok": False, "error": str(e)[:200]}))
        sys.exit(2)
    init_s = time.perf_counter() - t0
    backend = jax.default_backend()

    # small-scalar RTT (median of 5): dispatch + completion fetch
    x = jnp.float32(1.0)
    f = jax.jit(lambda v: v + 1)
    float(f(x))  # compile
    rtts = []
    for _ in range(5):
        t = time.perf_counter()
        float(f(x))
        rtts.append(time.perf_counter() - t)
    rtt_ms = sorted(rtts)[len(rtts) // 2] * 1e3

    # bulk H2D / D2H (64 MB f32)
    import numpy as np

    host = np.ones((4096, 4096), np.float32)
    t = time.perf_counter()
    devarr = jax.device_put(host, dev)
    devarr.block_until_ready()
    # force completion with a fetch of one element (the tunnel can ack
    # block_until_ready early — PERF.md measurement gotchas)
    float(devarr[0, 0])
    h2d_s = time.perf_counter() - t
    t = time.perf_counter()
    back = np.asarray(devarr)
    d2h_s = time.perf_counter() - t
    assert back[0, 0] == 1.0
    mb = host.nbytes / 1e6

    # tiny fresh compile (uncacheable shape salt mixing pid and a
    # sub-second clock component so neither the in-process cache nor a
    # persistent JAX_COMPILATION_CACHE_DIR can hide remote-compile
    # latency — two probes seconds apart must not collide)
    import os

    salt = (int(time.time() * 997) ^ os.getpid()) % 4093 + 3
    g = jax.jit(lambda v: (v @ v.T).sum())
    t = time.perf_counter()
    float(g(jnp.ones((salt, 128), jnp.float32)))
    compile_s = time.perf_counter() - t

    # dispatch-chain throughput: 20 chained matmuls, one fetch
    m = jnp.ones((1024, 1024), jnp.bfloat16)
    h = jax.jit(lambda v: v @ v)
    h(m).block_until_ready()
    t = time.perf_counter()
    out = m
    for _ in range(20):
        out = h(out)
    float(out[0, 0].astype(jnp.float32))
    step_ms = (time.perf_counter() - t) / 20 * 1e3

    print(
        json.dumps(
            {
                "ok": True,
                "backend": backend,
                "init_s": round(init_s, 2),
                "rtt_ms": round(rtt_ms, 1),
                "h2d_MBps": round(mb / h2d_s, 1),
                "d2h_MBps": round(mb / d2h_s, 1),
                "compile_s": round(compile_s, 2),
                "step_ms": round(step_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
