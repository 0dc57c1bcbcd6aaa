"""Differential tests: C++ host runtime vs the pure-Python implementations."""

import hashlib
import os

import numpy as np
import pytest

from stark_tpu import native
from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.r1cs import arithmetize as ar
from stark_tpu.r1cs.reader import read_r1cs, read_witness

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _load(name):
    with open(os.path.join(FIX, f"{name}.r1cs"), "rb") as f:
        r1cs_bytes = f.read()
    with open(os.path.join(FIX, f"{name}.wtns"), "rb") as f:
        wtns_bytes = f.read()
    return r1cs_bytes, wtns_bytes


def test_blake2s_matches_hashlib():
    for msg in [b"", b"a", b"x" * 63, b"y" * 64, b"z" * 321, bytes(range(256))]:
        assert native.blake2s(msg) == hashlib.blake2s(msg).digest()
    msgs = np.frombuffer(os.urandom(64 * 100), dtype=np.uint8).reshape(100, 64)
    out = native.blake2s_batch(msgs)
    for i in range(100):
        assert out[i].tobytes() == hashlib.blake2s(msgs[i].tobytes()).digest()


@pytest.mark.parametrize("name", ["compute", "bits", "poseidon3_test"])
def test_parsers_match_python(name):
    r1cs_bytes, wtns_bytes = _load(name)
    ref = read_r1cs(r1cs_bytes)
    flat = native.read_r1cs_flat(r1cs_bytes)
    assert flat.n_wires == ref.header.n_wires
    assert flat.n_constraints == ref.header.n_constraints
    assert flat.prime_number == ref.header.prime_number
    assert flat.n_labels == ref.header.n_labels
    k = 0
    for ci, cons in enumerate(ref.constraints):
        for fi, fac in enumerate(cons.factors):
            assert flat.ncoeffs[ci, fi] == fac.n_coefficient
            for co in fac.coefficients:
                assert flat.wire_ids[k] == co.wire_id
                assert flat.values[k].tobytes() == co.value
                k += 1
    assert k == flat.wire_ids.shape[0]

    ref_wit = read_witness(wtns_bytes)
    flat_wit = native.read_witness_flat(wtns_bytes)
    assert flat_wit.shape[0] == len(ref_wit)
    for i, wb in enumerate(ref_wit):
        assert flat_wit[i].tobytes().rstrip(b"\x00") in (wb.rstrip(b"\x00"), wb)
        assert int.from_bytes(flat_wit[i].tobytes(), "little") == int.from_bytes(
            wb, "little"
        )


@pytest.mark.parametrize("name", ["compute", "bits", "poseidon3_test"])
def test_arithmetize_matches_python(name):
    r1cs_bytes, wtns_bytes = _load(name)
    ref = read_r1cs(r1cs_bytes)
    wit_bytes = read_witness(wtns_bytes)
    witness = [spec.from_bytes_le(w) for w in wit_bytes]
    n_pub = 1 + ref.header.n_public_inputs + ref.header.n_public_outputs
    want = ar.arithmetize(spec, ref.constraints, witness, ref.header.n_wires, n_pub)

    flat = native.read_r1cs_flat(r1cs_bytes)
    wit_np = native.read_witness_flat(wtns_bytes)
    got = native.arithmetize_flat(
        flat, wit_np, spec.p.to_bytes(32, "little"), n_pub
    )

    n = got.original_steps
    assert n == want.original_steps
    s_ints = [int.from_bytes(got.s[i].tobytes(), "little") for i in range(n)]
    p_ints = [int.from_bytes(got.p[i].tobytes(), "little") for i in range(n)]
    k_ints = [int.from_bytes(got.k[i].tobytes(), "little") for i in range(n)]
    assert s_ints == want.witness_trace
    assert p_ints == want.computational_trace
    assert k_ints == want.coefficients
    assert got.flag1.tolist() == want.flag1
    assert got.flag2.tolist() == want.flag2
    assert got.permuted_indices.tolist() == want.permuted_indices
    assert got.last_coeff_list.tolist() == want.last_coeff_list
    assert got.public_first_indices == want.public_first_indices


def test_arithmetize_rejects_out_of_range_wire_ids():
    """A malformed .r1cs with wire_id >= n_wires must raise, not OOB
    (the reference Rust path panics on the same input; run.rs:159)."""
    r1cs_bytes, wtns_bytes = _load("compute")
    flat = native.read_r1cs_flat(r1cs_bytes)
    wit_np = native.read_witness_flat(wtns_bytes)
    n_pub = 2
    p_le = spec.p.to_bytes(32, "little")

    bad = native.FlatR1cs(**{**flat.__dict__})
    bad.wire_ids = flat.wire_ids.copy()
    bad.wire_ids[0] = flat.n_wires + 1000
    with pytest.raises(ValueError):
        native.arithmetize_flat(bad, wit_np, p_le, n_pub)

    empty = native.FlatR1cs(**{**flat.__dict__})
    empty.n_wires = 0
    with pytest.raises(ValueError):
        native.arithmetize_flat(empty, None, p_le, n_pub)
