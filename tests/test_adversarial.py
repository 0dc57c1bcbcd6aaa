"""Adversarial proof-format tests: every malformed proof is rejected with a
clean error (ValueError / AssertionError), never an IndexError, a kernel
shape error, a hang, or an OOM.

The reference verifier only type-checks the FRI round sequence
(`/root/reference/packages/fri/src/fri.rs:332-334,366-381`) and otherwise
panics on honest-prover invariants; this build validates the full proof
shape up front (`protocol/verify._validate_proof_shape`) and hardens the
JSON decoder (`protocol/proof.from_json`). Base artifact: the committed
compute golden proof (byte-identical to the reference pipeline's output).
"""

import copy
import json
import os

import pytest

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.fri.fri import FriLast, FriMiddle
from stark_tpu.merkle.tree import MerkleProof
from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner
from stark_tpu.r1cs.reader import read_r1cs, read_witness

pytestmark = pytest.mark.quick

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def compute():
    with open(os.path.join(FIX, "compute.r1cs"), "rb") as f:
        r1cs = read_r1cs(f.read())
    with open(os.path.join(FIX, "compute.wtns"), "rb") as f:
        witness = read_witness(f.read())
    with open(os.path.join(FIX, "compute_proof_golden.json")) as f:
        golden = f.read()
    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
    return r1cs, witness[:n_pub], golden


def _verify(compute, proof):
    r1cs, pub, _ = compute
    return runner.verify_with_witness(r1cs, pub, proof)


def _fresh(compute):
    return proof_mod.from_json(compute[2])


def test_golden_verifies(compute):
    assert _verify(compute, _fresh(compute))


# --- JSON-level malformation -------------------------------------------------

@pytest.mark.parametrize(
    "text",
    [
        "",  # empty
        "not json at all {",
        "[]",  # wrong top-level type
        '{"m_root": [0]}',  # missing keys
        '{"m_root": "zzz", "l_root": [], "a_root": [], "main_branches": [],'
        ' "linear_comb_branches": [], "fri_proof": []}',  # root not a byte list
    ],
    ids=["empty", "bad-json", "wrong-type", "missing-keys", "root-not-bytes"],
)
def test_malformed_json_rejected(text):
    with pytest.raises(ValueError, match="malformed proof JSON"):
        proof_mod.from_json(text)


def test_byte_values_out_of_range(compute):
    obj = json.loads(compute[2])
    obj["m_root"][0] = 256  # not a byte
    with pytest.raises(ValueError, match="malformed proof JSON"):
        proof_mod.from_json(json.dumps(obj))


def test_negative_byte_values(compute):
    obj = json.loads(compute[2])
    obj["l_root"][3] = -1
    with pytest.raises(ValueError, match="malformed proof JSON"):
        proof_mod.from_json(json.dumps(obj))


def test_oversized_json_leaf(compute):
    # a multi-megabyte leaf must be rejected by shape validation, not hashed
    obj = json.loads(compute[2])
    obj["linear_comb_branches"][0]["leaf"] = [0] * (1 << 22)
    proof = proof_mod.from_json(json.dumps(obj))
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


# --- structural malformation (parsed, pre-crypto) ----------------------------

@pytest.mark.parametrize("field", ["m_root", "l_root", "a_root"])
@pytest.mark.parametrize("size", [0, 31, 33, 4096])
def test_wrong_root_length(compute, field, size):
    proof = _fresh(compute)
    setattr(proof, field, b"\x07" * size)
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_truncated_linear_comb_branches(compute):
    proof = _fresh(compute)
    proof.linear_comb_branches = proof.linear_comb_branches[:-1]
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_truncated_main_branches(compute):
    proof = _fresh(compute)
    del proof.main_branches[17]
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_extra_branch(compute):
    proof = _fresh(compute)
    proof.main_branches.append(proof.main_branches[0])
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_wrong_leaf_size(compute):
    proof = _fresh(compute)
    b = proof.main_branches[0]
    proof.main_branches[0] = MerkleProof(b.leaf[:255], list(b.nodes))
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_wrong_sibling_size(compute):
    proof = _fresh(compute)
    b = proof.linear_comb_branches[0]
    proof.linear_comb_branches[0] = MerkleProof(
        b.leaf, [b.nodes[0][:31]] + list(b.nodes[1:])
    )
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_absurdly_deep_branch(compute):
    proof = _fresh(compute)
    b = proof.linear_comb_branches[0]
    proof.linear_comb_branches[0] = MerkleProof(b.leaf, [b"\x00" * 32] * 100)
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_truncated_branch_nodes_rejected_by_merkle(compute):
    # right counts and sizes but a sibling path one level short: passes
    # shape validation, must fail the Merkle walk with a clean error
    proof = _fresh(compute)
    b = proof.linear_comb_branches[0]
    proof.linear_comb_branches[0] = MerkleProof(b.leaf, list(b.nodes[:-1]))
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


# --- FRI sequence malformation ------------------------------------------------

def test_empty_fri_proof(compute):
    proof = _fresh(compute)
    proof.fri_proof = []
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_fri_wrong_round_count(compute):
    proof = _fresh(compute)
    # duplicate a Middle round (compute's tiny domain has none; inject one)
    proof.fri_proof = [
        FriMiddle(b"\x00" * 32, [], [])
    ] + proof.fri_proof
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_fri_last_not_terminal(compute):
    proof = _fresh(compute)
    last = proof.fri_proof[-1]
    proof.fri_proof = [last, last]
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_fri_last_wrong_length(compute):
    proof = _fresh(compute)
    last = proof.fri_proof[-1]
    proof.fri_proof[-1] = FriLast(last.last[:-3])
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_fri_last_wrong_value_size(compute):
    proof = _fresh(compute)
    last = proof.fri_proof[-1]
    proof.fri_proof[-1] = FriLast([last.last[0][:31]] + list(last.last[1:]))
    with pytest.raises(ValueError, match="malformed proof"):
        _verify(compute, proof)


def test_fri_last_tampered_value(compute):
    # correct shape, tampered content: caught by the last-round re-merklize
    proof = _fresh(compute)
    last = proof.fri_proof[-1]
    v = bytearray(last.last[5])
    v[0] ^= 1
    proof.fri_proof[-1] = FriLast(list(last.last[:5]) + [bytes(v)] + list(last.last[6:]))
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


def test_fri_noncanonical_last_value(compute):
    # a >= p 32-byte encoding in the Last data: decoded mod p, but the
    # re-merklization of the RAW bytes no longer matches the committed root
    proof = _fresh(compute)
    last = proof.fri_proof[-1]
    big = (spec.from_bytes_le(last.last[0]) + spec.p).to_bytes(32, "little")
    proof.fri_proof[-1] = FriLast([big] + list(last.last[1:]))
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


# --- content tampering (shape-valid, crypto-invalid) --------------------------

def test_tampered_m_root(compute):
    proof = _fresh(compute)
    r = bytearray(proof.m_root)
    r[0] ^= 1
    proof.m_root = bytes(r)
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


def test_tampered_leaf_content(compute):
    proof = _fresh(compute)
    b = proof.main_branches[0]
    leaf = bytearray(b.leaf)
    leaf[0] ^= 1
    proof.main_branches[0] = MerkleProof(bytes(leaf), list(b.nodes))
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


def test_swapped_branches(compute):
    proof = _fresh(compute)
    proof.linear_comb_branches[0], proof.linear_comb_branches[1] = (
        proof.linear_comb_branches[1],
        proof.linear_comb_branches[0],
    )
    with pytest.raises((ValueError, AssertionError)):
        _verify(compute, proof)


def test_wrong_public_wires(compute):
    r1cs, pub, golden = compute
    proof = proof_mod.from_json(golden)
    bad_pub = list(pub)
    bad_pub[-1] = (int.from_bytes(pub[-1], "little") + 1).to_bytes(32, "little")
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_witness(r1cs, bad_pub, proof)
