import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. The axon sitecustomize forces
# jax_platforms="axon,cpu", so the env var alone is not enough — override the
# config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA compiles of the
# while-loop explorer kernels; cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
