"""Multi-host execution proof: 2 real ``jax.distributed`` processes.

VERDICT r02 gap #1: the multi-host wiring (``jax.distributed.initialize``
in train.py, ``make_array_from_process_local_data`` in parallel/mesh.py,
loader ``shard_id``/``num_shards``) had never executed with
``process_count() > 1``. This launches 2 coordinator-connected processes on
localhost CPU (2 virtual devices each, a 4-device global mesh), each feeding
its disjoint half of a deterministic global batch, and asserts the global
sharded step computes the same loss as a single-process run — making the
"multi-host ready" claim in PARITY.md §2.8 an executed fact.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process():
    port = _free_port()
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools/multihost_proof.py"),
             "--num-processes", "2", "--process-id", str(pid),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses, losses2 = [], []
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS ([-\d.]+)", out)
        m2 = re.search(r"MULTIHOST_LOSS2 ([-\d.]+)", out)
        assert m and m2, f"missing loss lines in:\n{out}"
        losses.append(float(m.group(1)))
        losses2.append(float(m2.group(1)))

    # both processes see the same global loss (it is one global program)
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert losses2[0] == pytest.approx(losses2[1], rel=1e-6)
    assert losses2[0] < losses[0]  # training moves

    # single-process ground truth: same global batch, same init, no mesh
    import __graft_entry__ as ge

    trainer = ge._build_trainer(
        batch_size=8, input_size=64, backend_name="resnet",
        backend_params={"num_layers": 18, "num_classes": 6,
                        "pretrained": False},
    )
    trainer.init_done()
    batch = ge._tiny_batch(8, 64)
    out1 = trainer.step(batch, is_training=True)
    np.testing.assert_allclose(losses[0],
                               float(out1["stats"]["total_loss"]),
                               rtol=1e-4)
