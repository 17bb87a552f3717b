"""Data-parallel device mesh for training steps.

The reference scales with single-process ``nn.DataParallel`` (replicate +
scatter/gather each step over <=2 GPUs; utils/helper.py:75-80 engaged at
train.py:76-78). The TPU-native equivalent: a ``jax.sharding.Mesh`` over all
local (or all global) devices, the batch sharded over the ``data`` axis,
parameters replicated, and gradients all-reduced over ICI by XLA's GSPMD —
one code path from 1 chip to a full pod slice. Multi-host runs only need
``jax.distributed.initialize()`` before mesh creation; pjit emits DCN
collectives across slices automatically.

Design notes vs the reference:
- BatchNorm statistics become *global-batch* statistics under GSPMD's
  global-view semantics (the mean/var reductions are all-reduced over the
  mesh) — stronger than DataParallel's per-replica BN; see SURVEY §7.
- gradient all-reduce rides ICI via XLA collectives; no NCCL/MPI analog
  exists in the reference (SURVEY §2.8) so this is strictly more capable.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


@dataclass
class MeshContext:
    mesh: Mesh
    data_axis: str = "data"

    @classmethod
    def create(cls, data_parallel: Optional[int] = None,
               devices: Optional[list] = None) -> "MeshContext":
        devices = devices if devices is not None else jax.devices()
        n = int(data_parallel) if data_parallel else len(devices)
        mesh = Mesh(np.asarray(devices[:n]).reshape(n), ("data",))
        return cls(mesh=mesh)

    # ------------------------------------------------------------------
    @property
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.data_axis))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: Any) -> Any:
        """Place a host batch sharded over the data axis (leading dim).

        Multi-host: each process feeds its local slice of the global batch
        (the loader shards sample indices by ``jax.process_index()``);
        ``make_array_from_process_local_data`` assembles the global array.
        """
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self.batch_sharding, np.asarray(x)
                ),
                batch,
            )
        return jax.device_put(batch, self.batch_sharding)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated)

    # ------------------------------------------------------------------
    def shard_train_step(self, train_step: Callable) -> Callable:
        """jit a ``(state, batch) -> (state, stats)`` step over the mesh.

        The state is replicated, the batch sharded over ``data``; XLA inserts
        the gradient all-reduce. The state buffer is donated.
        """
        jitted = jax.jit(
            train_step,
            in_shardings=(self.replicated, self.batch_sharding),
            donate_argnums=(0,),
        )

        def wrapped(state, batch):
            return jitted(state, batch)

        return wrapped

    def shard_eval_step(self, eval_step: Callable) -> Callable:
        return jax.jit(
            eval_step,
            in_shardings=(self.replicated, self.batch_sharding),
        )
