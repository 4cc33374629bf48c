"""Run a tool on the CPU backend, really.

The environment's TPU plugin overrides JAX_PLATFORMS programmatically
(see tests/conftest.py), so ``JAX_PLATFORMS=cpu python tools/x.py`` still
lands on the remote TPU — and concurrent tool runs then contend with
benchmarks for the one chip. This wrapper counter-forces the CPU backend
before handing off:

  python tools/run_cpu.py tools/eval_fidelity.py [args...]
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# reuse the test suite's persistent compile cache (same HLO, same CPU
# backend) so repeated tool runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/mfsr_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

path = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(path, run_name="__main__")
