"""Benchmark: COCO-val-style inference throughput on one TPU chip.

Measures end-to-end per-image inference of the flagship Mask2Former-Open
R50 (bf16 compute): backbone -> pixel decoder (6-layer windowed-deformable
encoder, fused Pallas kernels, 8-cell sampling window — the flagship
default chosen on held-out accuracy evidence, PERF.md round 9; the
TPU-first semantic is documented in models/deformable.py; BENCH_WINDOW
overrides for speed-config A/B runs) -> 9-layer masked-attention
decoder -> mask upsample to the padded input -> open-vocabulary instance
post-processing, at the reference's test resolution (1333x800 keep-ratio
-> 800x1344 padded bucket;
/root/reference/configs/instance/coco_b48n17.py test_pipeline).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``A100_BASELINE_IPS`` is an estimate for the reference implementation on
A100: mmdet's Mask2Former-R50 model zoo reports ~9.7 fps on V100 for this
architecture at the same resolution; A100 is ~2x V100 on this workload.
``vs_baseline`` = measured images/sec/chip / this estimate.  See
BASELINE.md "Throughput-baseline sensitivity" for the error bars on that
estimate.

Scope note: the metric is on-chip model throughput — images are
pre-normalized random tensors already resident on device (the host input
pipeline — JPEG decode, resize, normalize — is excluded; it runs in
threaded prefetch workers overlapped with the chip in the real eval loop,
engine/test_loop.py). Inputs are RANDOM (not zeros) so data-dependent
effects (denormals, postproc top-k mask density) are exercised.

Robustness (learned from round 2, where the round-end run produced no
number): before tracing the full model, a tiny merged-kernel probe runs
in a SUBPROCESS and its failure is classified —

  * backend init failure (axon tunnel down, UNAVAILABLE /
    RESOURCE_EXHAUSTED): retry with backoff; the parent process never
    touches the backend until a probe has succeeded, so a dead tunnel
    costs seconds per retry, not a poisoned process.
  * Mosaic/lowering failure on a fresh kernel config: step down a ladder
    of env-knob configs (compact in-kernel preps -> classic XLA preps)
    and re-probe.  Each probe compiles a toy kernel (~seconds), so a bad
    config is rejected BEFORE the ~10-min full-model trace instead of
    after it.

Prints exactly ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

A100_BASELINE_IPS = 19.4  # est.: mmdet Mask2Former-R50 V100 ~9.7 fps x2

# throughput-optimal on v5e-1 (27.6 img/s vs 26.0 at batch 8);
# BENCH_BATCH overrides for sweeps (tools/, PERF.md)
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
# flagship sampling window (configs/instance/coco_b48n17.py): per-value-
# level mixed windows (8, 6, 4) — constant clamp reach in pixels across
# strides, 1.23x end-to-end vs W=8 (PERF.md round 12) at statistically
# indistinguishable held-out accuracy over 3 seeds (ACCURACY.md §4).
# A single int ("8") selects a uniform window for A/B runs.
_wspec = os.environ.get("BENCH_WINDOW", "8,6,4")
WINDOW = (
    int(_wspec)
    if "," not in _wspec
    else tuple(int(x) for x in _wspec.split(","))
)
HW = (800, 1344)
WARMUP = 3
ITERS = 8

# seconds we allow for backend-init retries before giving up; each retry
# sleeps PROBE_RETRY_SLEEP.  Overridable for local experiments.
PROBE_BUDGET = float(os.environ.get("BENCH_PROBE_BUDGET", "900"))
PROBE_RETRY_SLEEP = float(os.environ.get("BENCH_PROBE_SLEEP", "30"))
# per-probe subprocess timeout: a DEAD tunnel usually hangs backend init
# (no error), so this bounds how much of the budget one hung init eats.
# 600s, not 300: round 5 measured the remote MOSAIC compile of the toy
# windowed kernel at ~430 s on an otherwise-healthy tunnel (h2d 35 MB/s,
# tiny-matmul compile 1 s) — a 300 s timeout misread that as a dead
# backend and burned the whole probe budget on retries.
PROBE_TIMEOUT = float(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))

# Kernel-config ladder, most to least aggressive.  Stage 0 is whatever
# the environment says (defaults shown); later stages progressively
# revert the newest kernel features.  The probe walks down until one
# compiles on the real backend.
_KNOBS = (
    "DEFORM_COMPACT",
    "DEFORM_COORD16",
    "DEFORM_OUT_T",
    "DEFORM_HP",
    "DEFORM_SPARSE",
    "DEFORM_LN",
)
CONFIG_LADDER = [
    {},  # as configured (fused LN + compact preps + int16 coords
    # + out_t + hp=2; DEFORM_SPARSE defaults OFF — on-chip regression,
    # see _sparse_enabled)
    {"DEFORM_LN": "0", "DEFORM_SPARSE": "0"},  # newest features first off
    {"DEFORM_LN": "0", "DEFORM_SPARSE": "0", "DEFORM_COORD16": "0"},
    {
        "DEFORM_LN": "0",
        "DEFORM_SPARSE": "0",
        "DEFORM_COMPACT": "0",
        "DEFORM_COORD16": "0",
    },
    {
        "DEFORM_LN": "0",
        "DEFORM_SPARSE": "0",
        "DEFORM_COMPACT": "0",
        "DEFORM_COORD16": "0",
        "DEFORM_OUT_T": "0",
        "DEFORM_HP": "1",
    },  # classic: on-chip proven since round 2
]

_PROBE_SRC = r"""
import sys
import jax, jax.numpy as jnp
import numpy as np
if jax.default_backend() == "cpu":
    print("PROBE_OK cpu")
    sys.exit(0)
from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
    windowed_ms_deform_attn_pallas,
)
shapes = [(2, 3), (4, 6), (8, 12)]
s = sum(h * w for h, w in shapes)
rng = np.random.RandomState(0)
value = jnp.asarray(rng.randn(1, s, 2, 8), jnp.float32)
locs = jnp.asarray(rng.rand(1, s, 2, 3, 4, 2), jnp.float32)
wgts = jnp.asarray(rng.rand(1, s, 2, 3, 4), jnp.float32)
_ws = __import__("os").environ.get("BENCH_WINDOW", "8,6,4")
_win = int(_ws) if "," not in _ws else tuple(int(x) for x in _ws.split(","))
out = jax.jit(
    lambda v, l, w: windowed_ms_deform_attn_pallas(
        v, shapes, l, w, window=_win
    )
)(value, locs, wgts)
jax.block_until_ready(out)
float(jnp.asarray(out).ravel()[0])
from betrayed_by_captions_tpu.models.deformable_cm import (
    _ln_pallas_enabled,
)
if _ln_pallas_enabled():
    from betrayed_by_captions_tpu.ops.layernorm_pallas import layernorm_cm
    x = jnp.asarray(rng.randn(1, 8, 11, 7), jnp.bfloat16)
    y = jax.jit(layernorm_cm)(
        x, jnp.ones((8,), jnp.float32), jnp.zeros((8,), jnp.float32)
    )
    float(jnp.asarray(y).ravel()[0])
print("PROBE_OK", jax.default_backend())
"""

_BACKEND_MARKERS = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "RESOURCE_EXHAUSTED",
    "DEADLINE_EXCEEDED",
    "failed to connect",
    "Connection reset",
)


def _run_probe(env_overrides):
    env = dict(os.environ)
    env.update(env_overrides)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=PROBE_TIMEOUT,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return "timeout", "probe subprocess timed out"
    out = proc.stdout + proc.stderr
    if proc.returncode == 0 and "PROBE_OK" in out:
        return "ok", out
    if any(m in out for m in _BACKEND_MARKERS):
        return "backend", out
    return "kernel", out


def probe_and_pick_config():
    """Walk the config ladder until a probe compiles; classify backend
    outages separately and retry them with backoff.  Returns the env
    overrides to apply (possibly {})."""
    deadline = time.time() + PROBE_BUDGET
    stage = 0
    while True:
        overrides = CONFIG_LADDER[stage]
        status, out = _run_probe(overrides)
        if status == "ok":
            if stage:
                print(
                    f"bench: kernel probe picked ladder stage {stage} "
                    f"({overrides})",
                    file=sys.stderr,
                    flush=True,
                )
            return overrides
        if status in ("backend", "timeout"):
            if time.time() + PROBE_RETRY_SLEEP > deadline:
                # Exit FAST: a full-model trace cannot succeed on a dead
                # backend and would eat whatever driver time remains (a
                # late tunnel recovery is better spent re-running bench
                # from scratch).  One line says why there is no number.
                print(
                    "bench: backend unavailable for the whole "
                    f"{PROBE_BUDGET:.0f}s probe budget; exiting without "
                    "a measurement (last probe output tail follows)",
                    file=sys.stderr,
                    flush=True,
                )
                print(
                    "\n".join(str(out).strip().splitlines()[-8:]),
                    file=sys.stderr,
                    flush=True,
                )
                sys.exit(3)
            print(
                f"bench: backend unavailable ({status}); retrying in "
                f"{PROBE_RETRY_SLEEP:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(PROBE_RETRY_SLEEP)
            continue
        # kernel/lowering failure: step down the ladder
        tail = "\n".join(out.strip().splitlines()[-15:])
        print(
            f"bench: probe failed at ladder stage {stage}:\n{tail}",
            file=sys.stderr,
            flush=True,
        )
        if stage + 1 < len(CONFIG_LADDER):
            stage += 1
            continue
        print(
            "bench: all ladder stages failed the probe; attempting the "
            "classic config anyway",
            file=sys.stderr,
            flush=True,
        )
        return CONFIG_LADDER[-1]



# Minimum H2D bandwidth for a measured run to be attempted at all.  The
# measured path moves >250 MB (params + BATCH images + the 46 MB
# executable); below this rate WARMUP+ITERS cannot finish inside the
# driver budget, and round 4's bench died rc=124 after measuring
# h2d=0.0 MB/s and proceeding anyway.  A sub-minute diagnostic exit
# (code 4) beats a silent timeout: the driver records the stderr tail.
MIN_H2D_MBPS = float(os.environ.get("BENCH_MIN_H2D", "2.0"))


def _measure_h2d():
    """(h2d_MBps, rtt_ms) or (None, None) — diagnostics must never break
    the measurement."""
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp

        dev = jax.devices()[0]
        host = np.ones((2048, 2048), np.float32)  # 16 MB
        t = time.perf_counter()
        arr = jax.device_put(host, dev)
        float(arr[0, 0])
        h2d = host.nbytes / 1e6 / (time.perf_counter() - t)
        f = jax.jit(lambda v: v + 1)
        float(f(jnp.float32(0.0)))
        t = time.perf_counter()
        float(f(jnp.float32(1.0)))
        rtt = (time.perf_counter() - t) * 1e3
        return h2d, rtt
    except Exception:
        return None, None


def _report_link_quality():
    """Log tunnel quality (H2D bandwidth + scalar RTT) and REFUSE the
    measured run over a dead link: round 4's bench measured h2d=0.0,
    proceeded anyway, and died rc=124 with no number for the round.
    The tunnel also shows transient multi-minute dropouts WITHIN a
    healthy session (round 5: 32 MB/s at 01:48, 0.7 at 02:24, 35 at
    02:31), so a failing reading is retried before giving up; only a
    persistently dead link exits (code 4, sub-minute, one-line
    diagnostic for the driver log)."""
    for attempt in range(3):
        h2d, rtt = _measure_h2d()
        if h2d is None:
            return
        print(
            f"bench: link h2d={h2d:.1f} MB/s rtt={rtt:.0f} ms",
            file=sys.stderr,
            flush=True,
        )
        if h2d >= MIN_H2D_MBPS:
            return
        if attempt < 2:
            print(
                f"bench: link below {MIN_H2D_MBPS} MB/s minimum; "
                "re-probing in 60s (transient-dropout check)",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(60)
    print(
        f"bench: link dead: h2d={h2d:.2f} MB/s < {MIN_H2D_MBPS} MB/s "
        "minimum on 3 probes over 2 min; refusing the measured run "
        "(set BENCH_MIN_H2D=0 to override)",
        file=sys.stderr,
        flush=True,
    )
    sys.exit(4)


def main():
    import jax
    import jax.numpy as jnp

    from betrayed_by_captions_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    _report_link_quality()

    from betrayed_by_captions_tpu.engine.train_step import make_eval_step
    from betrayed_by_captions_tpu.models.class_banks import (
        asset_path,
        load_class_banks,
    )
    from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen
    from betrayed_by_captions_tpu.models.fusion_head import (
        instance_postprocess_shared,
    )

    banks = load_class_banks(
        asset_path("embeddings", "coco_class_with_bert_emb.json"),
        known_file=asset_path("splits", "known_65.txt"),
        unknown_file=asset_path("splits", "unknown_17.txt"),
    )

    model = Mask2FormerOpen(
        num_classes=banks.num_base,
        num_queries=100,
        feat_channels=256,
        emb_dim=768,
        num_decoder_layers=9,
        use_caption_generation=False,
        attn_impl="windowed_pallas",
        deform_window=WINDOW,
        dtype=jnp.bfloat16,
    )
    # random normalized-image-statistics input (see scope note above)
    images = jax.random.normal(
        jax.random.PRNGKey(17), (BATCH, HW[0], HW[1], 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), images[:1])["params"]
    eval_step = make_eval_step(model, upsample=False)
    all_bank = jnp.asarray(banks.all_bank)

    @jax.jit
    def full_inference(params, images):
        out = eval_step(params, images)
        sel, masks_binary = instance_postprocess_shared(
            out["cls_emb_preds"],
            out["mask_preds"],
            {"all": all_bank},
            out_hw=HW,
            max_per_image=100,
        )
        res = sel["all"]
        return (
            res.labels,
            res.scores,
            res.boxes,
            res.query_idx,
            masks_binary.sum(axis=(1, 2, 3)),
        )

    # warmup / compile; completion is forced by FETCHING a scalar — via
    # the axon tunnel block_until_ready can return before the chip
    # finishes (PERF.md measurement gotchas)
    for _ in range(WARMUP):
        r = full_inference(params, images)
        float(r[1][0, 0])

    # dispatch all iterations, then force once at the end: a
    # per-iteration sync pays one host<->device round trip per batch
    # (~30 ms via the axon tunnel = ~2 ms/img of pure artifact); the
    # device serializes the calls, so fetching a scalar from EVERY
    # iteration's output after the loop (first fetch waits for the
    # chain) measures actual chip throughput
    t0 = time.perf_counter()
    results = [full_inference(params, images) for _ in range(ITERS)]
    fetched = [float(r[1][0, 0]) for r in results]
    assert len(fetched) == ITERS
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "coco_val_inference_throughput",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
        os.environ.update(probe_and_pick_config())
    try:
        main()
    except Exception:
        # Last-resort guard (the probe should have caught config
        # problems): one retry on the classic XLA-prep path, which has
        # run on-chip since round 2.
        if all(os.environ.get(k) == v for k, v in CONFIG_LADDER[-1].items()):
            raise
        import traceback

        traceback.print_exc()
        print("bench: retrying with classic preps", file=sys.stderr, flush=True)
        os.environ.update(CONFIG_LADDER[-1])
        main()
