"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised with
`--xla_force_host_platform_device_count=8` as the "fake backend" (the
reference has no distributed tests at all; see SURVEY.md §4).  Real-TPU
benchmarking happens via bench.py, not the unit suite.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
