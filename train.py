#!/usr/bin/env python
"""CLI entry point: ``python train.py experiment=<name> [key=value ...]``.

Same command-line surface as the reference's hydra main (train.py:70-71).
"""

from centernet_uda_tpu.train import main

if __name__ == "__main__":
    main()
