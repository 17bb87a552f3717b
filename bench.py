#!/usr/bin/env python
"""Benchmark: train+inference throughput (images/sec/chip) on the flagship model.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Workload definition follows BASELINE.md: 512x512 input, batch 16, Adam,
down_ratio 4 — the reference's training defaults (configs/defaults.yaml:102-109,
datasets/coco.py:25) on the flagship DLA-34 + DCNv2 backend. Runs on
whatever accelerator jax sees (one TPU chip under the driver); the backend
is switchable via BENCH_BACKEND (dla | resnet | mobilenetv2 | efficientnet).

Structure (round-2 lesson — BENCH_r02.json rc=124 — refined in round 4
after BENCH_r03 recorded null decode/DCN numbers because the cold DLA
compile consumed the whole budget): the two CHEAP-COMPILE north-star
micro-benches (fused decode latency, per-op DCN fwd/bwd) run FIRST under
a small pre-budget, then the core train+infer measurement runs and the
JSON line prints with everything measured so far. The expensive optional
stages (800px eval-resolution inference, host-pipeline rate) run after
the core print under the main budget and write to stderr +
outputs/bench_extra.json, never stdout — one slow compile can therefore
delay but never suppress the core line, and the micro numbers can never
be starved by the main compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_START = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _START


def _pipeline_rate() -> float:
    """Host loader rate (real aug + native encode at 512px), measured in a
    fresh JAX-free subprocess: forking worker processes from a process
    that already initialized the TPU runtime can deadlock."""
    import json as json_lib
    import subprocess
    from pathlib import Path

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["IMAGES"] = "48"
    env["MODE"] = "process"
    env["WORKERS"] = str(min(os.cpu_count() or 1, 8))
    out = subprocess.run(
        [sys.executable,
         str(Path(__file__).resolve().parent / "tools/bench_pipeline.py")],
        env=env, capture_output=True, text=True, timeout=240,
    )
    line = out.stdout.strip().splitlines()[-1]
    return float(json_lib.loads(line)["pipeline_images_per_sec"])


# analytic model FLOPs per image, forward pass — conv/matmul math of the
# MODEL only (tools/flops_count.py walks the jaxpr and sums dot_general +
# conv_general_dilated; DCN sampling arithmetic and other elementwise work
# is implementation overhead and deliberately not credited). For scale: XLA
# cost analysis of the same forward reports 71.1 GFLOP/img with the
# sampling arithmetic included. MFU uses fwd*3 for a train step (bwd ≈ 2x
# fwd) against the chip's peak dense bf16 rate.
_FWD_GFLOPS_IMG = {"dla": 57.2}
# peak dense bf16 FLOP/s per chip by jax device_kind
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def main():
    # persistent XLA/Mosaic compile cache: the DCN kernels compile slowly
    # through the remote-compile tunnel; cache hits make re-runs start fast.
    # Repo-local so a builder-session warm-up survives to the driver's
    # end-of-round run even if /tmp is recycled (gitignored, never committed).
    # NOTE: this image preloads jax at interpreter startup, so the
    # JAX_COMPILATION_CACHE_DIR env var is read before any script line runs
    # — os.environ.setdefault is a silent no-op; the config update is not.
    _cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jaxcache"))
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    # cache even sub-second compiles: through the remote-compile tunnel a
    # "0.4 s" compile costs ~10x its local time, and there are many of them
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    backend_name = os.environ.get("BENCH_BACKEND", "dla")
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    input_size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    warmup = int(os.environ.get("BENCH_WARMUP", 3))
    # optional-stage wall-clock budget, measured from process start. Any
    # optional stage only *starts* while under budget, so one slow compile
    # can never prevent the core JSON line from printing.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "330"))
    # pre-stage budget: the decode + per-op DCN micro-benches run BEFORE
    # the main model compile (their programs are tiny — a starved pre-stage
    # would mean the whole bench had no chance anyway), each gated so a
    # slow pre-compile can only delay, not starve, the core line.
    pre_budget_s = float(os.environ.get("BENCH_PRE_BUDGET_S", "150"))

    import __graft_entry__ as ge
    import jax.numpy as jnp

    from centernet_uda_tpu.ops import dcn as dcn_ops

    dcn_ops.set_pallas_default(os.environ.get("BENCH_DCN", "auto"))

    # bfloat16 compute is the TPU-native default (MXU-native, halves HBM);
    # params and losses stay float32
    dtype = (jnp.float32 if os.environ.get("BENCH_DTYPE") == "float32"
             else jnp.bfloat16)
    if backend_name == "dla":
        backend_params = {"num_classes": 6, "dtype": dtype}
    elif backend_name == "resnet":
        backend_params = {"num_layers": 18, "num_classes": 6,
                          "pretrained": False, "dtype": dtype}
    elif backend_name == "mobilenetv2":
        backend_params = {"num_classes": 6, "pretrained": False,
                          "use_dcn": True, "use_skip": True, "dtype": dtype}
    elif backend_name == "efficientnet":
        backend_params = {"variant": "b0", "num_classes": 6,
                          "pretrained": False, "dtype": dtype}
    else:
        raise SystemExit(f"unknown BENCH_BACKEND {backend_name!r}")

    # NOTE: under the axon-tunneled TPU, block_until_ready does not actually
    # synchronize; only a host fetch does. All timings below pipeline `steps`
    # dispatches and then fetch a scalar from the LAST result — device
    # execution is in-order, so the fetch bounds the full sequence.
    def sync(value):
        np.asarray(jax.tree.leaves(value)[0])

    from centernet_uda_tpu.ops.decode import decode_detections

    # --- PRE-STAGE 1: decode latency (north-star metric; tiny compile) ---
    # pipelined mean over many calls: per-call sync through the axon tunnel
    # would measure the tunnel's ~0.6 ms dispatch latency, not the decode,
    # so a true p50 is not measurable here — the key says what it is.
    decode_mean_ms = None
    if os.environ.get("BENCH_DECODE", "1") == "1" and _elapsed() < pre_budget_s:
        try:
            hm_only = jax.jit(lambda hm, wh, reg: decode_detections(
                hm, wh, reg, k=100, apply_sigmoid=True))
            out_hw = input_size // 4
            hm = jnp.zeros((batch_size, out_hw, out_hw, 6), jnp.float32)
            whx = jnp.ones((batch_size, out_hw, out_hw, 2), jnp.float32)
            regx = jnp.zeros((batch_size, out_hw, out_hw, 2), jnp.float32)
            d = hm_only(hm, whx, regx)
            sync(d)
            n_dec = max(steps * 5, 50)
            t0 = time.perf_counter()
            for _ in range(n_dec):
                d = hm_only(hm, whx, regx)
            sync(d)
            decode_mean_ms = (time.perf_counter() - t0) / n_dec * 1e3
        except Exception as exc:  # never fail the core bench
            print(f"# decode bench skipped: {exc}", file=sys.stderr,
                  flush=True)

    # --- PRE-STAGE 2: per-op DCN micro-bench (VERDICT r02 #7 / r03 #1:
    # per-op numbers belong in the driver JSON). Hot DLA layer shape, both
    # directions; a single-layer Mosaic compile, far cheaper than the full
    # model's, and its timing can no longer be starved by the main compile.
    dcn_fwd_ms = dcn_bwd_ms = None
    if (backend_name == "dla" and os.environ.get("BENCH_DCN_OPS", "1") == "1"
            and _elapsed() < pre_budget_s):
        try:
            dcn_fwd_ms, dcn_bwd_ms = _bench_dcn_ops(jax, jnp, sync, steps)
        except Exception as exc:  # never fail the core bench
            print(f"# dcn per-op bench skipped: {exc}", file=sys.stderr,
                  flush=True)

    # --- core measurement: the full train + infer steps ------------------
    trainer = ge._build_trainer(
        batch_size=batch_size, input_size=input_size,
        backend_name=backend_name, backend_params=backend_params,
    )
    trainer.init_done()
    batch = ge._tiny_batch(batch_size, input_size)
    # pre-stage on device: measures device step throughput. (Host->device
    # transfer through the axon debug tunnel runs at ~30 MB/s and would
    # dominate; on a real TPU host the input pipeline overlaps transfers.)
    batch = {
        k: jax.device_put(v)
        for k, v in batch.items()
        if k not in ("gt_dets", "gt_areas", "gt_kps", "id")
    }

    # --- training throughput -------------------------------------------
    for _ in range(warmup):
        out = trainer.step(batch, is_training=True)
    sync(out["stats"]["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        out = trainer.step(batch, is_training=True)
    sync(out["stats"]["total_loss"])
    train_dt = time.perf_counter() - t0
    train_ips = batch_size * steps / train_dt

    # --- inference (forward + decode) throughput ------------------------
    module = trainer.backend.module
    state = trainer.state

    @jax.jit
    def infer(params, batch_stats, x):
        outputs = module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return decode_detections(
            outputs["hm"], outputs["wh"], outputs["reg"], k=100,
            apply_sigmoid=True,
        )

    x = jnp.asarray(batch["input"])
    dets = infer(state.params, state.batch_stats, x)
    sync(dets)
    t0 = time.perf_counter()
    for _ in range(steps):
        dets = infer(state.params, state.batch_stats, x)
    sync(dets)
    infer_dt = time.perf_counter() - t0
    infer_ips = batch_size * steps / infer_dt

    # combined train+infer images/sec/chip (harmonic-style: one train step
    # plus one inference pass per image)
    combined = 1.0 / (1.0 / train_ips + 1.0 / infer_ips)

    n_chips = max(jax.device_count(), 1)
    # vs_baseline: ratio to this rebuild's OWN round-1 driver-verified
    # number for the identical workload (BENCH_r01.json: 34.58 img/s/chip
    # combined) — NOT the north star's "3x the A100 PyTorch reference"
    # (BASELINE.json), which is un-measurable here (no A100, no COCO data;
    # the reference publishes no numbers, BASELINE.md). Only valid for the
    # anchor's exact workload (DLA, 512px, batch 16, bf16); the absolute
    # efficiency signal is the mfu_* fields below.
    r01_anchor = (34.58 if backend_name == "dla" and input_size == 512
                  and batch_size == 16 and dtype == jnp.bfloat16 else None)
    # MFU against the chip's peak dense bf16 rate: model-math FLOPs only
    # (fwd = _FWD_GFLOPS_IMG analytic count; train step = 3x fwd since
    # bwd ≈ 2x fwd). Sampling/select overhead of the DCN implementation is
    # deliberately NOT credited — MFU measures useful model math.
    gflops = _FWD_GFLOPS_IMG.get(backend_name) if input_size == 512 else None
    peak = _PEAK_BF16.get(getattr(jax.devices()[0], "device_kind", ""))
    mfu_train = mfu_infer = None
    if gflops and peak and dtype == jnp.bfloat16:
        mfu_train = round(train_ips * gflops * 1e9 * 3 / peak, 4)
        mfu_infer = round(infer_ips * gflops * 1e9 / peak, 4)
    value = round(combined / n_chips, 2)
    result = {
        "metric": (f"{backend_name} {input_size}px train+infer throughput "
                   "(vs_baseline anchored to this rebuild's r01 driver "
                   "measurement; reference publishes no numbers)"),
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": (round(value / r01_anchor, 2) if r01_anchor else None),
        "detail": {
            "train_images_per_sec": round(train_ips, 2),
            "infer_images_per_sec": round(infer_ips, 2),
            "mfu_train": mfu_train,
            "mfu_infer": mfu_infer,
            "decode_mean_ms_pipelined": (
                round(decode_mean_ms, 3) if decode_mean_ms else None),
            "dcn_fwd_ms": round(dcn_fwd_ms, 2) if dcn_fwd_ms else None,
            "dcn_bwd_ms": round(dcn_bwd_ms, 2) if dcn_bwd_ms else None,
            "batch_size": batch_size,
            "devices": n_chips,
            "host_cores": os.cpu_count() or 1,
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result), flush=True)

    # ===== everything below runs AFTER the core JSON line and writes to
    # stderr + outputs/bench_extra.json only =====
    extra = {}

    # 800px eval-resolution inference (configs/defaults.yaml:67): the
    # stride-4 DCN layers run at W=200 through the select Pallas kernels.
    # Default-on since round 4 (VERDICT r03 #8) — runs after the core line
    # under the main budget.
    if (os.environ.get("BENCH_800", "1") == "1" and backend_name == "dla"
            and _elapsed() < budget_s):
        b800 = max(batch_size // 2, 1)
        x800 = jnp.asarray(
            np.random.RandomState(0)
            .randn(b800, 800, 800, 3).astype(np.float32))
        dets = infer(state.params, state.batch_stats, x800)
        sync(dets)
        t0 = time.perf_counter()
        for _ in range(steps):
            dets = infer(state.params, state.batch_stats, x800)
        sync(dets)
        extra["infer_800px_images_per_sec"] = round(
            b800 * steps / (time.perf_counter() - t0), 2)

    # host input-pipeline rate (aug + native encode + collate), per core.
    # SURVEY §7 hard part #5: the host must outrun the device step rate.
    # Default-on since round 4 (VERDICT r03 #9) — a JAX-free subprocess.
    if os.environ.get("BENCH_PIPELINE", "1") == "1" and _elapsed() < budget_s:
        try:
            extra["pipeline_images_per_sec"] = round(_pipeline_rate(), 2)
        except Exception as exc:
            print(f"# pipeline bench skipped: {exc}", file=sys.stderr,
                  flush=True)

    if extra:
        print(json.dumps({"extra": extra}), file=sys.stderr, flush=True)
        try:
            os.makedirs("outputs", exist_ok=True)
            with open("outputs/bench_extra.json", "w") as f:
                json.dump(extra, f, indent=2)
        except OSError:
            pass


def _bench_dcn_ops(jax, jnp, sync, steps):
    """Time the hot DLA DCN layer (16x128x128x64, 3x3) fwd and fwd+bwd."""
    from centernet_uda_tpu.ops.dcn import dcn_v2

    # operand dtypes match the in-model regime exactly (x/weight bf16,
    # offset/mask f32 — the DCN module always casts offsets to f32,
    # ops/dcn.py) so the train phase's compiled kernels are representative
    # and ideally cache-shared
    b, h, w, c = 16, 128, 128, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05,
                      jnp.bfloat16)
    bias = jnp.zeros((c,), jnp.float32)
    off = jnp.asarray(rng.randn(b, h, w, 18), jnp.float32)
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(b, h, w, 9), jnp.float32))

    # measure the implementation the model actually runs (the raw dcn_v2
    # default is use_pallas=False — without this the numbers silently
    # reported the XLA gather path)
    from centernet_uda_tpu.ops.dcn import get_pallas_default

    use_pallas = get_pallas_default()

    def loss(xx, oo, mm, ww):
        return jnp.sum(dcn_v2(xx, oo, mm, ww, bias,
                              use_pallas=use_pallas).astype(jnp.float32))

    # every timed call returns a SCALAR: the axon tunnel ships each call's
    # output buffers back to the host at ~0.5 GB/s, so timing an op with a
    # 64 MB output measures the tunnel, not the kernel. The final reduce
    # adds a fixed ~0.3 ms that cancels in the fwd+bwd-minus-fwd estimate.
    fwd = jax.jit(loss)

    def bwd_loss(xx, oo, mm, ww):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(xx, oo, mm, ww)
        return sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

    bwd = jax.jit(bwd_loss)

    y = fwd(x, off, mask, wgt)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = fwd(x, off, mask, wgt)
    sync(y)
    fwd_ms = (time.perf_counter() - t0) / steps * 1e3

    g = bwd(x, off, mask, wgt)
    sync(g)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = bwd(x, off, mask, wgt)
    sync(g)
    # fwd+bwd minus fwd ≈ bwd alone
    bwd_ms = max((time.perf_counter() - t0) / steps * 1e3 - fwd_ms, 0.0)
    return fwd_ms, bwd_ms


if __name__ == "__main__":
    main()
