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
