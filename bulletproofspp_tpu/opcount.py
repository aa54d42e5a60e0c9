"""Exact element-op accounting for the Pallas field kernels.

The round-2 roofline model hand-estimated the complete-add instruction
stream (~3.1k muls + ~21k add/logic per lane) and concluded the fused
kernel ran at ~26% of the VPU bound.  Hand estimates of carry/concat
scaffolding are unreliable; this module derives the count from the
TRACED computation instead: it walks the jaxpr of the actual kernel
body and charges every primitive by the number of u32 elements it
produces (the VPU executes elementwise lane-ops; data movement
primitives — concatenate/pad/broadcast — are charged as copies, which
Mosaic largely executes as real vector moves between tiles).

Used by bench.py to compute `padd_vpu_bound_ns` honestly, and by the
kernel-optimization loop to attribute ops to phases.

Reference for what is being modeled: the 256-bit field mul the kernel
replaces is reference src/Data/Field/Galois/FastPrime/Internal.hs:939-973.
"""

from __future__ import annotations

import collections
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# primitives charged as multiplies (the VPU's expensive int op)
_MUL_PRIMS = {"mul"}
# primitives charged as cheap elementwise ops (add/logic/select/compare)
_ELEM_PRIMS = {
    "add", "sub", "and", "or", "xor", "shift_right_logical",
    "shift_left", "shift_right_arithmetic", "not", "neg",
    "eq", "ne", "lt", "le", "gt", "ge", "select_n", "max", "min",
    "convert_element_type", "rem", "clamp",
}
# data movement charged one op per OUTPUT element (vector copies)
_COPY_PRIMS = {"concatenate", "pad", "reshape", "rev", "transpose", "squeeze",
               "expand_dims", "gather", "dynamic_slice", "dynamic_update_slice",
               "scatter-add", "scatter"}
# reductions charged one op per INPUT element (the adds of the tree)
_REDUCE_PRIMS = {"reduce_sum", "reduce_max", "reduce_min", "reduce_and",
                 "reduce_or", "argmax", "argmin"}
# shape-only / free
_FREE_PRIMS = {"broadcast_in_dim", "iota", "slice", "copy", "stop_gradient",
               "bitcast_convert_type", "integer_pow", "sign"}


def _size(v) -> int:
    return int(np.prod(v.aval.shape)) if v.aval.shape else 1


def _size_tiled(v) -> int:
    """Size after padding to the VPU's (8, 128) vector-register tile:
    the sublane (second-minor) axis rounds up to 8, lanes to 128.  An op
    on a (17, L) tensor executes 24 rows of work; a (1, L) op executes
    8 — this is the charge model that reflects what Mosaic actually
    issues, where _size charges the pure element stream."""
    shape = v.aval.shape
    if not shape:
        return 8 * 128  # scalar splat still occupies a register op
    lanes = -(-shape[-1] // 128) * 128
    rows = -(-shape[-2] // 8) * 8 if len(shape) >= 2 else 8
    lead = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return lead * rows * lanes


def count_jaxpr(jaxpr, counts=None, live=None):
    """Walk a (closed) jaxpr, returning {category: element_ops}.

    Eqns whose inputs derive only from CONSTANTS (literals / constvars —
    e.g. the packed-carry weight rows built from jnp.full + concatenate)
    are charged as free: XLA constant-folds them at compile time, so
    charging them would overstate the instruction-stream bound and
    flatter the kernel's utilization number."""
    if counts is None:
        counts = collections.Counter()
    if live is None:
        live = set(map(id, jaxpr.invars))
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        eqn_live = any(
            not hasattr(v, "val") and id(v) in live for v in eqn.invars
        )
        if eqn_live:
            live.update(id(v) for v in eqn.outvars)
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                count_jaxpr(inner.jaxpr if hasattr(inner, "jaxpr") else inner, counts)
            continue
        if name in ("scan", "while", "fori_loop"):
            # charge body ops x trip count
            if name == "scan":
                body = eqn.params["jaxpr"].jaxpr
                trips = eqn.params["length"]
            else:
                body = eqn.params["body_jaxpr"].jaxpr
                trips = eqn.params.get("trip_count", 0) or 0
            sub = count_jaxpr(body, collections.Counter())
            for k, v in sub.items():
                counts[k] += v * max(trips, 1)
            continue
        if not eqn_live:
            counts["const_folded"] += sum(_size(v) for v in eqn.outvars)
            continue
        out_elems = sum(_size(v) for v in eqn.outvars)
        out_tiled = sum(_size_tiled(v) for v in eqn.outvars)
        if name in _MUL_PRIMS:
            counts["mul"] += out_elems
            counts["mul_tiled"] += out_tiled
        elif name in _ELEM_PRIMS:
            counts["elem"] += out_elems
            counts["elem_tiled"] += out_tiled
        elif name in _COPY_PRIMS:
            counts["copy"] += out_elems
            counts["copy_tiled"] += out_tiled
        elif name in _REDUCE_PRIMS:
            counts["elem"] += sum(_size(v) for v in eqn.invars)
            counts["elem_tiled"] += sum(_size_tiled(v) for v in eqn.invars)
        elif name in _FREE_PRIMS:
            counts["free"] += out_elems
        else:
            counts[f"other:{name}"] += out_elems
            counts[f"other_tiled:{name}"] += out_tiled
    return counts


def count_fn(fn: Callable, *args, per_lane_axis_size: int | None = None):
    """Trace fn(*args) and return per-category element-op counts.

    If per_lane_axis_size is given, counts are divided by it (per-lane)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = count_jaxpr(jaxpr.jaxpr)
    if per_lane_axis_size:
        counts = {k: v / per_lane_axis_size for k, v in counts.items()}
    return dict(counts)


def padd_op_counts(width: int = 256):
    """Per-lane element-op counts of the production complete-add body."""
    from .ops import pallas_field as pf

    k2 = jnp.asarray(pf._kc())
    arrs = [jnp.zeros((pf.NLIMB, width), jnp.uint32) for _ in range(6)]

    def body(k2, *ps):
        return pf._padd_body(k2, *ps)

    return count_fn(body, k2, *arrs, per_lane_axis_size=width)


def padd_bound_ns(r_mul: float, r_elem: float, width: int = 256):
    """Instruction-stream lower bounds (ns per lane-padd) at the measured
    multi-issue VPU rates: muls at r_mul ops/s, everything else (adds,
    logic, copies) at r_elem ops/s.  Copies are charged at the elem rate
    — Mosaic executes concat/pad as vector moves through the same ports.

    Returns (element_bound, tile_bound, counts): the element bound
    charges the pure data stream (what an ideally-packed kernel would
    execute); the tile bound charges each op padded to the VPU's (8,128)
    vector-register tile (what Mosaic actually issues for the traced op
    sequence — e.g. every op on a 17-row c17 tensor executes 24 rows).
    The kernel's achievable floor lies between them: tile padding is
    real, but some of it could be reclaimed by row-alignment redesign."""
    c = padd_op_counts(width)
    mul = c.get("mul", 0.0)
    other = c.get("elem", 0.0) + c.get("copy", 0.0)
    mul_t = c.get("mul_tiled", 0.0)
    other_t = c.get("elem_tiled", 0.0) + c.get("copy_tiled", 0.0)
    return (
        (mul / r_mul + other / r_elem) * 1e9,
        (mul_t / r_mul + other_t / r_elem) * 1e9,
        c,
    )
