"""End-to-end prove -> serialize -> deserialize -> verify over the circom
fixtures (mirrors run.rs:627-679)."""

import os

import pytest

from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _paths(name, tmp_path):
    return (
        os.path.join(FIXTURES, f"{name}.r1cs"),
        os.path.join(FIXTURES, f"{name}.wtns"),
        str(tmp_path / f"{name}_proof.json"),
    )


def test_run_compute(tmp_path):
    r1cs, wtns, out = _paths("compute", tmp_path)
    runner.prove_with_file_path(r1cs, wtns, out)
    runner.verify_with_file_path(r1cs, wtns, out)
    # JSON round-trips exactly
    with open(out) as f:
        text = f.read()
    assert proof_mod.to_json(proof_mod.from_json(text)) == text


def test_tampered_proof_rejected(tmp_path):
    r1cs, wtns, out = _paths("compute", tmp_path)
    runner.prove_with_file_path(r1cs, wtns, out)
    with open(out) as f:
        proof = proof_mod.from_json(f.read())
    # corrupt one m-tree leaf byte
    leaf = bytearray(proof.main_branches[0].leaf)
    leaf[0] ^= 1
    proof.main_branches[0].leaf = bytes(leaf)
    with open(out, "w") as f:
        f.write(proof_mod.to_json(proof))
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_file_path(r1cs, wtns, out)


def test_wrong_public_input_rejected(tmp_path):
    from stark_tpu.r1cs.reader import read_r1cs, read_witness

    r1cs_path, wtns, out = _paths("compute", tmp_path)
    runner.prove_with_file_path(r1cs_path, wtns, out)
    with open(r1cs_path, "rb") as f:
        r1cs = read_r1cs(f.read())
    with open(wtns, "rb") as f:
        witness = read_witness(f.read())
    with open(out) as f:
        proof = proof_mod.from_json(f.read())
    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
    public = witness[:n_pub]
    public[1] = bytes([0xAA])  # lie about a public wire
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_witness(r1cs, public, proof)


@pytest.mark.slow
def test_run_poseidon3(tmp_path):
    r1cs, wtns, out = _paths("poseidon3_test", tmp_path)
    runner.run_with_file_path(r1cs, wtns, out)


@pytest.mark.slow
def test_run_bits(tmp_path):
    r1cs, wtns, out = _paths("bits", tmp_path)
    runner.run_with_file_path(r1cs, wtns, out)


@pytest.mark.slow
def test_run_pedersen(tmp_path):
    r1cs, wtns, out = _paths("pedersen_test", tmp_path)
    runner.run_with_file_path(r1cs, wtns, out)


def test_native_path_proof_identical(tmp_path, monkeypatch):
    """The C++ parse/arithmetize fast path must emit a byte-identical proof
    JSON to the pure-Python path (proofs are deterministic)."""
    from stark_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    r1cs, wtns, out_py = _paths("compute", tmp_path)
    out_nat = str(tmp_path / "compute_native.json")
    monkeypatch.setenv("STARK_TPU_NATIVE", "0")
    runner.prove_with_file_path(r1cs, wtns, out_py)
    monkeypatch.setenv("STARK_TPU_NATIVE", "1")
    runner.prove_with_file_path(r1cs, wtns, out_nat)
    with open(out_py) as f:
        a = f.read()
    with open(out_nat) as f:
        b = f.read()
    assert a == b
    runner.verify_with_file_path(r1cs, wtns, out_nat)


def test_periodic_tables_path_matches_golden(tmp_path, monkeypatch):
    """The big-domain HBM plan (periodic Z^-1/x^steps bases via
    kernels.mul_periodic + recomputed Zb3^-1; active above precision 2^22
    in production) must be byte-identical to the tiled-table path."""
    import stark_tpu.protocol.prove as pv
    from stark_tpu.protocol import runner

    monkeypatch.setenv("STARK_TPU_PERIODIC_TABLES_ABOVE", "1")
    pv._stages_cached.cache_clear()
    try:
        out = str(tmp_path / "compute_periodic.json")
        runner.prove_with_file_path(
            os.path.join(FIXTURES, "compute.r1cs"),
            os.path.join(FIXTURES, "compute.wtns"),
            out,
        )
        with open(out) as f:
            got = f.read()
        with open(os.path.join(FIXTURES, "compute_proof_golden.json")) as f:
            assert got == f.read()
    finally:
        pv._stages_cached.cache_clear()
