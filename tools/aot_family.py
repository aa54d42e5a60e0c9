"""AOT-compile the whole Pallas kernel family locally (run from tools/)."""
from aot_compile import aot_compile
import functools, jax, jax.numpy as jnp
from bulletproofspp_tpu.ops import pallas_field as pf

L = 65536
f_padd = lambda x1,y1,z1,x2,y2,z2: pf.padd_pallas((x1,y1,z1),(x2,y2,z2), block=512)
print("padd_pallas:", round(aot_compile(f_padd, *[(16,L)]*6), 1), "s")
f_tf = lambda px,py,pz: pf.table_flat_pallas(px,py,pz)
print("table_flat:", round(aot_compile(f_tf, *[(16,L)]*3), 1), "s")
f_sr = lambda fx,fy2,fz,a,s: pf.select_reduce_pallas(fx,fy2,fz,a,s)
print("select_reduce:", round(aot_compile(f_sr, (144,L),(288,L),(144,L),(33,L),(33,L)), 1), "s")
f_rb = lambda x,y,z: pf.reduce_block_pallas((x,y,z), factor=8)
print("reduce_block:", round(aot_compile(f_rb, *[(16, 33*L//8)]*3), 1), "s")
f_th = lambda x,y,z: pf.tail_horner_pallas((x,y,z), rows=33)
print("tail_horner:", round(aot_compile(f_th, *[(16, 33*128)]*3), 1), "s")
f_srf = lambda px,py,pz,a,s: pf.select_reduce_fused_pallas(px,py,pz,a,s)
print("select_reduce_fused:", round(aot_compile(f_srf, (16,L),(16,L),(16,L),(33,L),(33,L)), 1), "s")
f_h = lambda rx,ry,rz: pf.horner_pallas(rx,ry,rz)
print("horner:", round(aot_compile(f_h, *[(16, 33)]*3), 1), "s")
