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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # XLA:CPU on this host emits AMX/AVX512 executables that its own AOT
    # loader then refuses ("+prefer-no-scatter ... could lead to SIGILL")
    # and SEGFAULTS deserializing from the persistent cache (round-5 root
    # cause of the mid-suite crashes).  Capping the ISA keeps every cached
    # executable loadable; tests don't need AVX512 throughput.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache, enable_cpu_fast_field

enable_compilation_cache()
enable_cpu_fast_field()
