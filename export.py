#!/usr/bin/env python
"""CLI entry point: ``python export.py -e <experiment> [...]``.

Same command surface as the reference export CLI (export.py:139-163), with
XLA-native output formats (StableHLO / TF SavedModel) instead of ONNX.
"""

from centernet_uda_tpu.export import main

if __name__ == "__main__":
    main()
