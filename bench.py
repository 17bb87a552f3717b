#!/usr/bin/env python
"""Benchmark: train+inference throughput (images/sec/chip) on the flagship model.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "detail": {...}}

Workload definition follows BASELINE.md: 512x512 input, batch 16, Adam,
down_ratio 4 — the reference's training defaults (configs/defaults.yaml:102-109,
datasets/coco.py:25) on the flagship DLA-34 + DCNv2 backend. Runs on
whatever accelerator jax sees (one TPU chip under the driver); the backend
is switchable via BENCH_BACKEND (dla | resnet | mobilenetv2 | efficientnet).

Structure (VERDICT r04 #2/#6/#8: no number may live only in stderr): every
stage — decode latency, per-op DCN fwd/bwd, core train+infer, 800px eval
inference, host pipeline — runs BEFORE the single stdout JSON print and
folds its result into ``detail``. Each optional stage has its OWN
start-gate budget (one slow compile can delay later stages but cannot
consume their gate), and any stage that does not produce a number records
a ``<stage>_skip_reason`` string in ``detail`` instead — a null is never
ambiguous between "never ran", "crashed", and "budget-starved". The core
train+infer measurement is unconditional.
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


def _pipeline_rate(deadline_s: float) -> float:
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
        env=env, capture_output=True, text=True,
        timeout=max(deadline_s, 30.0),
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


def _warm(fn, *args, tries: int = 3, **kwargs):
    """First (compiling) call of a jitted function, retried on transient
    axon remote-compile tunnel failures ("response body closed before all
    bytes were read" — observed killing an otherwise-green bench run r05).
    The persistent compile cache makes the retry cheap; real compile
    errors (non-INTERNAL) surface immediately."""
    for attempt in range(tries):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # jax.errors.JaxRuntimeError et al.
            transient = ("remote_compile" in str(exc)
                         or "INTERNAL" in str(exc))
            if not transient or attempt == tries - 1:
                raise
            print(f"# transient compile-tunnel error (attempt {attempt + 1}/"
                  f"{tries}): {str(exc)[:160]}", file=sys.stderr, flush=True)
            time.sleep(3.0 * (attempt + 1))


class _Stages:
    """Per-stage results + skip reasons, all landing in the final JSON."""

    def __init__(self):
        self.detail = {}
        self.seconds = {}

    def run(self, name: str, enabled: bool, gate_s: float, fn) -> None:
        """Run one optional stage. ``fn`` returns a dict merged into
        detail; on skip/error write ``<name>_skip_reason`` instead."""
        if not enabled:
            self.detail[f"{name}_skip_reason"] = "disabled via env"
            return
        at = _elapsed()
        if at >= gate_s:
            self.detail[f"{name}_skip_reason"] = (
                f"budget: stage start at {at:.0f}s >= gate {gate_s:.0f}s")
            return
        t0 = time.perf_counter()
        try:
            self.detail.update(fn())
        except Exception as exc:  # never fail the core bench
            reason = f"error: {type(exc).__name__}: {exc}"
            self.detail[f"{name}_skip_reason"] = reason[:300]
            print(f"# {name} bench skipped: {reason}", file=sys.stderr,
                  flush=True)
        finally:
            self.seconds[name] = round(time.perf_counter() - t0, 1)


def main():
    # persistent XLA/Mosaic compile cache (repo-local .jaxcache): the DCN
    # kernels compile slowly through the remote-compile tunnel; cache hits
    # make the driver's cold run start fast. Importing __graft_entry__
    # installs it (its _enable_compile_cache runs at import).
    import __graft_entry__ as ge

    import jax
    import jax.numpy as jnp

    from centernet_uda_tpu.ops import dcn as dcn_ops
    from centernet_uda_tpu.ops.decode import decode_detections

    backend_name = os.environ.get("BENCH_BACKEND", "dla")
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    input_size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    warmup = int(os.environ.get("BENCH_WARMUP", 3))
    # start-gates (seconds from process start) per optional stage. The two
    # cheap-compile micro-benches run FIRST with independent gates (a slow
    # decode compile can no longer starve the DCN stage — VERDICT r04 #6);
    # the expensive stages run after the core measurement.
    gate_decode = float(os.environ.get("BENCH_GATE_DECODE_S", "150"))
    gate_dcn = float(os.environ.get("BENCH_GATE_DCN_S", "240"))
    gate_800 = float(os.environ.get("BENCH_GATE_800_S", "480"))
    gate_pipe = float(os.environ.get("BENCH_GATE_PIPE_S", "560"))

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

    stages = _Stages()

    # --- STAGE 1: decode latency (north-star metric; tiny compile) -------
    # pipelined mean over many calls: per-call sync through the axon tunnel
    # would measure the tunnel's ~0.6 ms dispatch latency, not the decode,
    # so a true p50 is not measurable here — the key says what it is.
    def _stage_decode():
        hm_only = jax.jit(lambda hm, wh, reg: decode_detections(
            hm, wh, reg, k=100, apply_sigmoid=True))
        out_hw = input_size // 4
        hm = jnp.zeros((batch_size, out_hw, out_hw, 6), jnp.float32)
        whx = jnp.ones((batch_size, out_hw, out_hw, 2), jnp.float32)
        regx = jnp.zeros((batch_size, out_hw, out_hw, 2), jnp.float32)
        d = _warm(hm_only, hm, whx, regx)
        sync(d)
        n_dec = max(steps * 5, 50)
        t0 = time.perf_counter()
        for _ in range(n_dec):
            d = hm_only(hm, whx, regx)
        sync(d)
        ms = (time.perf_counter() - t0) / n_dec * 1e3
        return {"decode_mean_ms_pipelined": round(ms, 3)}

    stages.run("decode", os.environ.get("BENCH_DECODE", "1") == "1",
               gate_decode, _stage_decode)

    # --- STAGE 2: per-op DCN micro-bench (VERDICT r02 #7 / r03 #1 /
    # r04 #2: per-op numbers belong in the driver JSON). Hot DLA layer
    # shape, both directions; a single-layer Mosaic compile per direction.
    stages.run("dcn_ops",
               (backend_name == "dla"
                and os.environ.get("BENCH_DCN_OPS", "1") == "1"),
               gate_dcn, lambda: _bench_dcn_ops(jax, jnp, sync, steps))

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
    # Two measurements of the same step function:
    #  * dispatch loop (headline, the methodology of every round): one jit
    #    dispatch per step, `steps` dispatches pipelined asynchronously and
    #    synchronized once by a host fetch — dispatch overhead overlaps
    #    device execution exactly as on a production host.
    #  * scan chunk (secondary, train_images_per_sec_scan): BENCH_CHUNK
    #    steps in ONE jit via lax.scan over the SAME pure train_step.
    #    Measured r05 on v5e: within ~1.5% of the dispatch loop (slightly
    #    SLOWER — async dispatch already pipelines; the scan only adds
    #    loop structure), kept as a cross-check that no per-step host
    #    overhead hides in the headline number.
    t_core = time.perf_counter()
    out = _warm(trainer.step, batch, is_training=True)
    for _ in range(warmup - 1):
        out = trainer.step(batch, is_training=True)
    sync(out["stats"]["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        out = trainer.step(batch, is_training=True)
    sync(out["stats"]["total_loss"])
    train_dt = time.perf_counter() - t0
    train_ips = batch_size * steps / train_dt

    import functools

    chunk = int(os.environ.get("BENCH_CHUNK", 10))
    train_fn = trainer._make_train_step()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state, b):
        def body(st, _):
            st2, stats = train_fn(st, b)
            return st2, stats["total_loss"]

        st, losses = jax.lax.scan(body, state, None, length=chunk)
        return st, losses[-1]

    st = trainer.state
    st, last = _warm(train_chunk, st, batch)  # compile + warm
    sync(last)
    n_chunks = max(steps // chunk, 2)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        st, last = train_chunk(st, batch)
    sync(last)
    train_dt = time.perf_counter() - t0
    trainer.state = st  # keep the trained state for the infer stages
    train_ips_scan = batch_size * chunk * n_chunks / train_dt

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
    dets = _warm(infer, state.params, state.batch_stats, x)
    sync(dets)
    t0 = time.perf_counter()
    for _ in range(steps):
        dets = infer(state.params, state.batch_stats, x)
    sync(dets)
    infer_dt = time.perf_counter() - t0
    infer_ips = batch_size * steps / infer_dt

    # scan-chunked inference (headline; same rationale as train_chunk). The
    # input is perturbed by a negligible function of the carry and the carry
    # consumes one detection element, so the body is NOT loop-invariant —
    # XLA's while-loop LICM cannot hoist the forward out of the loop, and
    # nothing is dead-code-eliminated.
    @jax.jit
    def infer_chunk(params, batch_stats, xx):
        def body(acc, _):
            xi = xx + (acc * 1e-30).astype(xx.dtype)
            d = module.apply(
                {"params": params, "batch_stats": batch_stats}, xi,
                train=False)
            d = decode_detections(d["hm"], d["wh"], d["reg"], k=100,
                                  apply_sigmoid=True)
            leaf = jax.tree.leaves(d)[0]
            return acc + leaf.astype(jnp.float32).ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=chunk)
        return acc

    acc = _warm(infer_chunk, state.params, state.batch_stats, x)
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        acc = infer_chunk(state.params, state.batch_stats, x)
    sync(acc)
    infer_ips_scan = batch_size * chunk * n_chunks / (time.perf_counter() - t0)
    stages.seconds["core"] = round(time.perf_counter() - t_core, 1)

    # --- STAGE 4: 800px eval-resolution inference (defaults.yaml:67): the
    # stride-4 DCN layers run at W=200 through the select Pallas kernels.
    def _stage_800():
        b800 = max(batch_size // 2, 1)
        x800 = jnp.asarray(
            np.random.RandomState(0)
            .randn(b800, 800, 800, 3).astype(np.float32))
        a = _warm(infer_chunk, state.params, state.batch_stats, x800)
        sync(a)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            a = infer_chunk(state.params, state.batch_stats, x800)
        sync(a)
        return {"infer_800px_images_per_sec": round(
            b800 * chunk * n_chunks / (time.perf_counter() - t0), 2)}

    stages.run("infer_800px",
               (os.environ.get("BENCH_800", "1") == "1"
                and backend_name == "dla"),
               gate_800, _stage_800)

    # --- STAGE 5: host input-pipeline rate (aug + native encode +
    # collate), per core. SURVEY §7 hard part #5: the host must outrun the
    # device step rate. A JAX-free subprocess.
    stages.run("pipeline",
               os.environ.get("BENCH_PIPELINE", "1") == "1", gate_pipe,
               lambda: {"pipeline_images_per_sec": round(
                   _pipeline_rate(gate_pipe + 120.0 - _elapsed()), 2)})

    # --- the single stdout JSON line -------------------------------------
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
    detail = {
        "train_images_per_sec": round(train_ips, 2),
        "infer_images_per_sec": round(infer_ips, 2),
        # cross-check: BENCH_CHUNK steps per jit via lax.scan (see the
        # training-throughput comment; within ~1.5% of the headline)
        "train_images_per_sec_scan": round(train_ips_scan, 2),
        "infer_images_per_sec_scan": round(infer_ips_scan, 2),
        "scan_chunk": chunk,
        "mfu_train": mfu_train,
        "mfu_infer": mfu_infer,
        "batch_size": batch_size,
        "devices": n_chips,
        "host_cores": os.cpu_count() or 1,
        "platform": jax.devices()[0].platform,
    }
    detail.update(stages.detail)
    detail["stage_seconds"] = stages.seconds
    result = {
        "metric": (f"{backend_name} {input_size}px train+infer throughput "
                   "(vs_baseline anchored to this rebuild's r01 driver "
                   "measurement; reference publishes no numbers)"),
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": (round(value / r01_anchor, 2) if r01_anchor else None),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


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

    y = _warm(fwd, x, off, mask, wgt)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = fwd(x, off, mask, wgt)
    sync(y)
    fwd_ms = (time.perf_counter() - t0) / steps * 1e3

    g = _warm(bwd, x, off, mask, wgt)
    sync(g)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = bwd(x, off, mask, wgt)
    sync(g)
    # fwd+bwd minus fwd ≈ bwd alone
    bwd_ms = max((time.perf_counter() - t0) / steps * 1e3 - fwd_ms, 0.0)
    return {"dcn_fwd_ms": round(fwd_ms, 2), "dcn_bwd_ms": round(bwd_ms, 2)}


if __name__ == "__main__":
    main()
