import os

# Multi-device CPU simulation for sharding tests; real TPU runs use bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Protocol e2e tests use the exact host engine (fast, no compiles); the JAX
# engine has dedicated parity tests in test_ops_*.py and runs in bench.py.
os.environ.setdefault("BPPP_ENGINE", "host")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
