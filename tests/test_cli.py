"""CLI end-to-end: test mode, exit codes, tampered proofs, and the
points.bin cache round trip (reference: app/Main.hs:132-152, 261-263)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {
    "basisSeed": "test points",
    "ranges": [{"base": 9, "min": 0, "max": 4294967296, "isOutput": True}],
}
WIT = [{"amount": 10000}]


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["BPPP_ENGINE"] = "host"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "bulletproofspp_tpu.cli", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "schema.json").write_text(json.dumps(SPEC))
    (tmp_path / "witness.json").write_text(json.dumps(WIT))
    return tmp_path


def test_cli_test_mode(workdir):
    r = _run(["test", "schema.json", "witness.json"], workdir)
    assert r.returncode == 0, r.stderr
    assert "In-process verify: True" in r.stdout
    assert "Proof from file: True" in r.stdout
    assert (workdir / "proof.bin").stat().st_size == 418


def test_cli_rejects_tampered_proof(workdir):
    assert _run(["prove", "schema.json", "witness.json"], workdir).returncode == 0
    data = bytearray((workdir / "proof.bin").read_bytes())
    data[50] ^= 1
    (workdir / "proof.bin").write_bytes(bytes(data))
    r = _run(["verify", "schema.json", "commits.bin", "proof.bin"], workdir)
    assert r.returncode == 1
    assert "False" in r.stdout


def test_cli_witness_count_mismatch(workdir):
    (workdir / "witness.json").write_text(json.dumps([{"amount": 1}, {"amount": 2}]))
    r = _run(["prove", "schema.json", "witness.json"], workdir)
    assert r.returncode == 2


def test_cli_out_of_range_clean_error(workdir):
    (workdir / "witness.json").write_text(json.dumps([{"amount": 2**40}]))
    r = _run(["prove", "schema.json", "witness.json"], workdir)
    assert r.returncode == 2
    assert "prove failed" in r.stderr


def test_cli_points_file_roundtrip(workdir):
    # write the basis cache, then re-prove reading points from the file
    r = _run(["prove", "schema.json", "witness.json", "--write-points", "20"], workdir)
    assert r.returncode == 0
    assert (workdir / "points.bin").exists()
    proof1 = (workdir / "proof.bin").read_bytes()
    spec2 = dict(SPEC)
    del spec2["basisSeed"]
    spec2["basisFile"] = "points.bin"
    (workdir / "schema2.json").write_text(json.dumps(spec2))
    r = _run(["test", "schema2.json", "witness.json", "commits2.bin", "proof2.bin"], workdir)
    assert r.returncode == 0, r.stderr + r.stdout
    assert (workdir / "proof2.bin").read_bytes() == proof1


def test_cli_batch_verify(workdir):
    # two proofs with different witnesses/seeds, one schema
    (workdir / "w2.json").write_text(json.dumps([{"amount": 777}]))
    r = _run(["prove", "schema.json", "witness.json", "c1.bin", "p1.bin"], workdir)
    assert r.returncode == 0, r.stderr
    spec2 = dict(SPEC)
    spec2["randomSeed"] = "another seed"
    (workdir / "schema2.json").write_text(json.dumps(spec2))
    r = _run(["prove", "schema2.json", "w2.json", "c2.bin", "p2.bin"], workdir)
    assert r.returncode == 0, r.stderr

    r = _run(["batch-verify", "schema.json", "c1.bin", "p1.bin", "c2.bin", "p2.bin"], workdir)
    assert r.returncode == 0, r.stderr
    assert "Batch of 2: True" in r.stdout

    # tamper one proof byte -> whole batch rejects with exit 1
    data = bytearray((workdir / "p2.bin").read_bytes())
    data[40] ^= 1
    (workdir / "p2.bin").write_bytes(bytes(data))
    r = _run(["batch-verify", "schema.json", "c1.bin", "p1.bin", "c2.bin", "p2.bin"], workdir)
    assert r.returncode == 1
    assert "Batch of 2: False" in r.stdout

    # odd file count -> usage error
    r = _run(["batch-verify", "schema.json", "c1.bin"], workdir)
    assert r.returncode == 2


def test_cli_prove_batch_mixed(workdir):
    """prove-batch: mixed schemas in one invocation, outputs verify
    individually (bucketed lockstep under the hood)."""
    spec16 = {
        "basisSeed": "test points 16",
        "argument": "NL",
        "ranges": [{"base": 16, "min": 0, "max": 65536, "isOutput": True}],
    }
    (workdir / "s16.json").write_text(json.dumps(spec16))
    (workdir / "w16.json").write_text(json.dumps([{"amount": 4242}]))
    r = _run(
        [
            "prove-batch",
            "--out-dir", "out",
            "schema.json", "witness.json",
            "s16.json", "w16.json",
            "schema.json", "witness.json",
        ],
        workdir,
    )
    assert r.returncode == 0, r.stderr
    assert "Wrote 3 proofs" in r.stdout
    for i, spec in [(0, "schema.json"), (1, "s16.json"), (2, "schema.json")]:
        rv = _run(["verify", spec, f"out/commits_{i}.bin", f"out/proof_{i}.bin"], workdir)
        assert rv.returncode == 0, rv.stderr + rv.stdout
    # items 0 and 2 share schema+witness but use distinct seeds
    assert (workdir / "out/proof_0.bin").read_bytes() != (workdir / "out/proof_2.bin").read_bytes()


def test_cli_prove_batch_odd_args(workdir):
    r = _run(["prove-batch", "schema.json"], workdir)
    assert r.returncode == 2


def test_cli_mp_prove(workdir):
    """mp-prove: 2 TCP party subprocesses jointly prove a 4-range
    aggregate; the standard verify subcommand accepts the files."""
    spec = {
        "basisSeed": "mp cli basis",
        "randomSeed": "mp cli rand",
        "ranges": [{"count": 4, "max": 2**32, "isShared": True, "base": 16}],
    }
    (workdir / "mps.json").write_text(json.dumps(spec))
    (workdir / "mpw.json").write_text(
        json.dumps([{"amount": a} for a in (5, 6, 7, 2**32 - 2)])
    )
    r = _run(
        ["mp-prove", "mps.json", "mpw.json", "mpc.bin", "mpp.bin",
         "--parties", "2", "--engine", "host"],
        workdir,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "Multiparty range proof (2 TCP subprocesses): True" in r.stdout
    rv = _run(["verify", "mps.json", "mpc.bin", "mpp.bin"], workdir)
    assert rv.returncode == 0, rv.stderr + rv.stdout


def test_cli_mp_prove_binary(workdir):
    """mp-prove on the BINARY protocol family (with an assumed range, so
    the compacted digit layout + blinding-tail assignment cross the
    process boundary); plain verify accepts the emitted files."""
    spec = {
        "binary": True,
        "basisSeed": "mp cli bin basis",
        "randomSeed": "mp cli bin rand",
        "ranges": [
            {"max": 2**32},
            {"max": 2**16, "isAssumed": True},
            {"max": 2**32},
        ],
    }
    (workdir / "mbs.json").write_text(json.dumps(spec))
    (workdir / "mbw.json").write_text(
        json.dumps([{"amount": 2**31}, {"amount": 777}, {"amount": 9}])
    )
    r = _run(
        ["mp-prove", "mbs.json", "mbw.json", "mbc.bin", "mbp.bin",
         "--parties", "2", "--engine", "host"],
        workdir,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "Multiparty range proof (2 TCP subprocesses): True" in r.stdout
    rv = _run(["verify", "mbs.json", "mbc.bin", "mbp.bin"], workdir)
    assert rv.returncode == 0, rv.stderr + rv.stdout
