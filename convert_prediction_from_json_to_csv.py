#!/usr/bin/env python
"""Reference-compatible entry point (see
yt8m_tpu/utils/convert_prediction.py)."""
import sys

from yt8m_tpu.utils.convert_prediction import main

if __name__ == "__main__":
    main(sys.argv[1:])
