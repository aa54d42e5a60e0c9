"""Two-process jax.distributed CPU cluster running the sharded MSM
across a process boundary (VERDICT r1 item 6: the multi-host code path,
exercised without a cluster per SURVEY §4)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(extra_args, marker: str, timeout: int = 600):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)] + extra_args,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([l for l in out.splitlines() if l.startswith(marker)])
    # both processes computed (and asserted) the same replicated result
    assert outs[0] and outs[0] == outs[1]


@pytest.mark.slow
def test_two_process_sharded_msm():
    _run_workers([], "RESULT")


@pytest.mark.slow
def test_two_process_batch_verify(tmp_path):
    """Protocol-level multi-process path (VERDICT r2 item 3): 64 encoded
    proofs batch-verified across a 2-process mesh; both processes must
    accept the clean batch and reject a 1-bit-tampered one."""
    import pickle

    from bulletproofspp_tpu.cli import _resolve_values
    from bulletproofspp_tpu.core import range_proof as rpm
    from bulletproofspp_tpu.core.engine import HostEngine
    from bulletproofspp_tpu.core.transcript import take_points
    from bulletproofspp_tpu.io_ import schema as schema_mod

    spec_obj = {
        "basisSeed": "mh batch",
        "argument": "NL",
        "ranges": [{"base": 16, "min": 0, "max": 2**32, "isOutput": True}],
    }
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    eng = HostEngine()
    blobs = []
    for i in range(64):
        vals = _resolve_values(spec, schema_mod.parse_witness([{"amount": 1000 + i}]))
        blobs.append(rpm.encode_proof(setup, rpm.prove(setup, vals, f"mh{i}".encode(), eng)))
    corpus = tmp_path / "corpus.pkl"
    corpus.write_bytes(pickle.dumps({"spec": spec_obj, "blobs": blobs}))

    # multi-process workers always compile fresh (BPPP_NO_COMPILE_CACHE,
    # see multihost_worker.py): decompress + sharded-MSM compiles for two
    # Gloo-synced CPU processes take 5-15 min under host load
    _run_workers(["batch", str(corpus)], "BATCH", timeout=1800)
