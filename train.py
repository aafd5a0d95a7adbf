#!/usr/bin/env python
"""Reference-compatible entry point: python train.py --model=... (see
yt8m_tpu/cli/train.py)."""
import sys

from yt8m_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:])
