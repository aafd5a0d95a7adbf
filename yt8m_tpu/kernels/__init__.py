"""Pallas TPU kernels for the hot aggregation ops (BASELINE.json
north_star). Each kernel ships with a jnp oracle and interpret-mode
equivalence tests; models dispatch to them on the inference path only
(training keeps the autodiff-able jnp graphs).

Set YT8M_DISABLE_PALLAS=1 to force the jnp paths everywhere (e.g. when a
constrained remote-compile relay rejects Mosaic payloads).
"""

import os


def kernels_enabled() -> bool:
    return os.environ.get("YT8M_DISABLE_PALLAS", "0") != "1"
