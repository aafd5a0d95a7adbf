#!/usr/bin/env python
"""Reference-compatible entry point: python inference.py
--input_data_pattern=... --output_file=... (see yt8m_tpu/cli/inference.py)."""
import sys

from yt8m_tpu.cli.inference import main

if __name__ == "__main__":
    main(sys.argv[1:])
