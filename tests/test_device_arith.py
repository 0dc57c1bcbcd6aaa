"""Device arithmetization: S gathered from the witness by per-slot wire id
and P derived as a gated segmented scan on device must reproduce the host
arithmetizer's columns byte-for-byte (run.rs:109-281 semantics)."""

import numpy as np
import pytest

from stark_tpu import native
from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.protocol import proof as proof_mod, runner
from stark_tpu.r1cs.arithmetize import arithmetize, slot_wire_ids_np
from stark_tpu.r1cs.reader import read_r1cs, read_witness
from stark_tpu.r1cs.synth import squaring_chain


def test_slot_wire_ids_matches_python_arithmetizer():
    r1cs, wb = squaring_chain(20)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    flat = native.flat_from_contents(r1cs)
    wids = slot_wire_ids_np(flat.ncoeffs, flat.wire_ids, flat.n_wires)
    assert [witness[w] for w in wids] == arith.witness_trace


def test_slot_wire_ids_on_fixture():
    with open("tests/fixtures/compute.r1cs", "rb") as f:
        r1cs = read_r1cs(f.read())
    with open("tests/fixtures/compute.wtns", "rb") as f:
        wit_b = f.read()
    witness = [spec.from_bytes_le(w) for w in read_witness(wit_b)]
    h = r1cs.header
    n_pub = 1 + h.n_public_inputs + h.n_public_outputs
    arith = arithmetize(spec, r1cs.constraints, witness, h.n_wires, n_pub)
    flat = native.flat_from_contents(r1cs)
    wids = slot_wire_ids_np(flat.ncoeffs, flat.wire_ids, flat.n_wires)
    assert [witness[w] for w in wids] == arith.witness_trace


@pytest.mark.skipif(not native.available(), reason="needs the C++ host lib")
def test_device_arith_proof_is_byte_identical(monkeypatch):
    r1cs, wb = squaring_chain(24)
    monkeypatch.setenv("STARK_TPU_DEVICE_ARITH", "0")
    legacy = proof_mod.to_json(runner.prove_with_witness(r1cs, wb))
    monkeypatch.setenv("STARK_TPU_DEVICE_ARITH", "1")
    dev = proof_mod.to_json(runner.prove_with_witness(r1cs, wb))
    assert dev == legacy
    ok = runner.verify_with_witness(r1cs, wb[:2], proof_mod.from_json(dev))
    assert ok


@pytest.mark.quick
def test_slot_wire_ids_empty_region():
    """A factor with ZERO coefficients (legal R1CS; pedersen_test has
    them) must take the n_wires-1 pad wire for the whole region -- and
    must not index past wire_ids when the empty region is the last one
    (the clamped gather np.where evaluates eagerly; caught by the
    round-5 pedersen re-run)."""
    from stark_tpu.r1cs.arithmetize import slot_wire_ids_np

    # constraint 0: |A|=2, |B|=0, |C|=1 ; constraint 1: |A|=1, |B|=1, |C|=0
    ncoeffs = np.array([[2, 0, 1], [1, 1, 0]])
    wire_ids = np.array([5, 6, 7, 8, 9], dtype=np.uint32)  # flat (con, region)
    n_wires = 100
    out = slot_wire_ids_np(ncoeffs, wire_ids, n_wires)
    a_len = 3  # max widths: 2 + 1
    A = out[:a_len].tolist()
    B = out[a_len : 2 * a_len].tolist()
    C = out[2 * a_len :].tolist()
    assert A == [5, 6, 8]
    assert B == [99, 99, 9]  # empty region -> all pad
    assert C == [7, 99, 99]  # |C2|=0 is the LAST region: was the crash
