import os

# Multi-device CPU simulation for sharding tests; real TPU runs use bench.py.
# The harness env pins JAX_PLATFORMS=axon and a sitecustomize imports jax at
# interpreter start, so setting the env var here is too late — update the
# live jax config as well (backends have not initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Protocol e2e tests use the exact host engine (fast, no compiles); the JAX
# engine has dedicated parity tests in test_ops_*.py and runs in bench.py.
os.environ.setdefault("BPPP_ENGINE", "host")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
