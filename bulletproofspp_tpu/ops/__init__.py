"""TPU compute path: batched limb field kernels, complete-formula curve ops,
vectorized GLV/Straus MSM, and the JaxEngine that plugs them into the
protocol layer (bulletproofspp_tpu.core.engine)."""
