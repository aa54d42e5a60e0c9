"""Local chipless AOT compile harness (no tunnel, no device)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import time, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import topologies

_TOPO = None
def topo_device():
    global _TOPO
    if _TOPO is None:
        _TOPO = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    return _TOPO.devices[0]

def aot_compile(f, *shapes):
    """Compile f for v5e locally; returns seconds taken."""
    s = jax.sharding.SingleDeviceSharding(topo_device())
    args = [jax.ShapeDtypeStruct(sh, jnp.uint32, sharding=s) for sh in shapes]
    t0 = time.perf_counter()
    jax.jit(f).lower(*args).compile()
    return time.perf_counter() - t0
