#!/usr/bin/env python
"""Reference-compatible entry point: python eval.py --eval_data_pattern=...
(see yt8m_tpu/cli/eval.py)."""
import sys

from yt8m_tpu.cli.eval import main

if __name__ == "__main__":
    main(sys.argv[1:])
