"""Per-op profile of the flagship train step on the real TPU.

Captures a jax.profiler trace of a few steady-state train steps (DLA-34,
512px, batch 16, bf16 — the BASELINE.md workload) and aggregates device-op
durations from the perfetto trace, grouped into buckets (DCN fwd/bwd
kernels, layout copies, fusions, convolutions), so kernel work can be
ranked by actual step share. Knobs: PROF_BACKEND, PROF_STEPS, PROF_SIZE,
PROF_BATCH, PROF_DCN (auto|pallas|xla).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# shared, guarded compile-cache helper (repo root already on sys.path):
# importing __graft_entry__ enables the .jaxcache compile cache
import __graft_entry__  # noqa: F401


import jax
import jax.numpy as jnp
import numpy as np


def main():
    import __graft_entry__ as ge
    from centernet_uda_tpu.ops import dcn as dcn_ops

    backend_name = os.environ.get("PROF_BACKEND", "dla")
    batch_size = int(os.environ.get("PROF_BATCH", 16))
    input_size = int(os.environ.get("PROF_SIZE", 512))
    steps = int(os.environ.get("PROF_STEPS", 3))
    dcn_ops.set_pallas_default(os.environ.get("PROF_DCN", "auto"))

    backend_params = {"num_classes": 6, "dtype": jnp.bfloat16}
    trainer = ge._build_trainer(
        batch_size=batch_size, input_size=input_size,
        backend_name=backend_name, backend_params=backend_params)
    trainer.init_done()
    batch = ge._tiny_batch(batch_size, input_size)
    batch = {k: jax.device_put(v) for k, v in batch.items()
             if k not in ("gt_dets", "gt_areas", "gt_kps", "id")}

    def sync(value):
        np.asarray(jax.tree.leaves(value)[0])

    is_training = os.environ.get("PROF_TRAIN", "1") == "1"

    def one_step():
        out = trainer.step(batch, is_training=is_training)
        return out["stats"]  # both phases return a stats dict

    for _ in range(3):
        out = one_step()
    sync(out)

    trace_dir = os.environ.get("PROF_DIR", "/tmp/prof_step")
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = one_step()
    sync(out)
    jax.profiler.stop_trace()

    report(trace_dir, steps)


def bucket(name: str) -> str:
    n = name.lower()
    if "dcn" in n or "nhwc_fwd" in n or "nhwc_bwd" in n or "custom-call" in n:
        return name  # keep pallas kernels / custom calls individually
    if n.startswith(("copy", "transpose", "bitcast")):
        return "[layout copies]"
    if "conv" in n:
        return "[convolutions]"
    if n.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
        return "[fusions]"
    if n.startswith(("reduce", "all-reduce")):
        return "[reductions]"
    return "[other]"


def report(trace_dir: str, steps: int):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # device-op complete events ONLY: resolve device pids from the
    # process_name metadata (host threads otherwise dominate "[other]")
    all_events = trace.get("traceEvents", [])
    device_pids = set()
    for e in all_events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str((e.get("args") or {}).get("name", ""))):
            device_pids.add(e.get("pid"))
    events = [e for e in all_events if e.get("ph") == "X"
              and (not device_pids or e.get("pid") in device_pids)]
    durs_by_name = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        # XLA op events carry 'long_name' / 'group_id'; host events don't
        name = e.get("name", "")
        if not name or name.startswith(("process_", "thread_")):
            continue
        if "tid" not in e:
            continue
        durs_by_name[name] += e.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1

    # heuristically keep the largest aggregation that looks like device ops
    agg = defaultdict(float)
    for name, ms in durs_by_name.items():
        agg[bucket(name)] += ms
    total = sum(durs_by_name.values())
    print(f"total traced op-time {total:.1f} ms over {steps} steps "
          f"({total / steps:.1f} ms/step-ish, overlap not deduped)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms / steps:9.2f} ms/step  {name}")
    print("\ntop raw ops:")
    for name, ms in sorted(durs_by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / steps:9.2f} ms/step  x{counts[name] // steps:3d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
