"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised with
`--xla_force_host_platform_device_count=8` as the "fake backend" (the
reference has no distributed tests at all; see SURVEY.md §4).  The
environment's sitecustomize registers the real-TPU axon backend and pins
jax_platforms programmatically, so we must override via jax.config, not env.
Real-TPU benchmarking happens in bench.py, not the unit suite.
"""

import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache, enable_cpu_fast_field

enable_compilation_cache()
enable_cpu_fast_field()
