"""Device-mesh parallelism (pjit/GSPMD) — the TPU-native replacement for the
reference's single-host ``torch.nn.DataParallel`` (utils/helper.py:75-80)."""

from centernet_uda_tpu.parallel.mesh import MeshContext

__all__ = ["MeshContext"]
