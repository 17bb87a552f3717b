"""Multi-host (multi-process) training-step proof worker.

Launched N times (one per simulated host) by ``tests/test_multihost.py`` or
by hand:

    python tools/multihost_proof.py --num-processes 2 --process-id 0 --port 12355 &
    python tools/multihost_proof.py --num-processes 2 --process-id 1 --port 12355

Each process brings up ``jax.distributed`` on localhost (the exact bring-up
path ``centernet_uda_tpu/train.py`` uses for real pods), owns 2 virtual CPU
devices, loads its disjoint half of a deterministic global batch (the
loader-shard contract: ``shard_id=jax.process_index()``), and runs ONE
sharded training step over the global mesh. The global loss — assembled by
``make_array_from_process_local_data`` + GSPMD collectives across process
boundaries — is printed as ``MULTIHOST_LOSS <value>`` for the parent to
compare against a single-process run of the same step.

The reference tops out at single-process ``nn.DataParallel``
(utils/helper.py:75-80); this executes the strictly-stronger multi-process
path for real rather than claiming it from wiring.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

# must be configured before jax import / backend init
_LOCAL_DEVICES = 2


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--batch-per-host", type=int, default=4)
    parser.add_argument("--input-size", type=int, default=64)
    args = parser.parse_args()

    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={_LOCAL_DEVICES}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # the image's axon TPU plugin force-appends itself to jax_platforms;
    # pin CPU in-process (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert len(jax.local_devices()) == _LOCAL_DEVICES

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    from centernet_uda_tpu.parallel.mesh import MeshContext

    global_batch = args.batch_per_host * args.num_processes
    trainer = ge._build_trainer(
        batch_size=global_batch, input_size=args.input_size,
        backend_name="resnet",
        backend_params={"num_layers": 18, "num_classes": 6,
                        "pretrained": False},
    )
    trainer.mesh = MeshContext.create()  # all global devices
    trainer.init_done()

    # deterministic global batch; this host feeds rows
    # [process_id*B_host, (process_id+1)*B_host) — the loader-shard contract
    batch = ge._tiny_batch(global_batch, args.input_size)
    lo = args.process_id * args.batch_per_host
    hi = lo + args.batch_per_host
    local = {k: v[lo:hi] for k, v in batch.items()}

    out = trainer.step(local, is_training=True)
    loss = float(out["stats"]["total_loss"])
    print(f"MULTIHOST_LOSS {loss:.6f}", flush=True)

    # one more step to prove the state (params/opt) stays globally consistent
    out2 = trainer.step(local, is_training=True)
    print(f"MULTIHOST_LOSS2 {float(out2['stats']['total_loss']):.6f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
