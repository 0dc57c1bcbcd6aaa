"""Digest genericity through the protocol (`H: Digest` parity).

The reference's prove/verify/FRI are generic over `H: Digest`
(`/root/reference/packages/r1cs-stark/src/run.rs:528-533`,
`fri/src/fri.rs:17-26`), with `PoseidonDigest` limited to 64-byte inputs
(`commitment/src/poseidon.rs:33` panics above). Here `digest="poseidon"`
commits the l-tree and every FRI tree (32-byte canonical-value leaves)
with the reference-compatible Poseidon digest, fully device-resident; the
m-tree (256-byte leaves, over the cap) and the a-tree (40-byte perm||S
leaves whose chunk canonicity is witness-dependent — the reference would
panic mid-prove) stay blake2s, as documented in `core.build_proof_stages`.

The committed golden pins the poseidon-committed compute proof.
"""

import os

import pytest

from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner
from stark_tpu.r1cs.reader import read_r1cs, read_witness

pytestmark = pytest.mark.quick

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDEN = os.path.join(FIX, "compute_proof_poseidon_golden.json")


@pytest.fixture(scope="module")
def compute():
    with open(os.path.join(FIX, "compute.r1cs"), "rb") as f:
        r1cs = read_r1cs(f.read())
    with open(os.path.join(FIX, "compute.wtns"), "rb") as f:
        witness = read_witness(f.read())
    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
    return r1cs, witness, n_pub


def test_poseidon_proof_matches_golden(compute):
    r1cs, witness, n_pub = compute
    proof = runner.prove_with_witness(r1cs, witness, digest="poseidon")
    with open(GOLDEN) as f:
        assert proof_mod.to_json(proof) == f.read()


def test_poseidon_golden_verifies(compute):
    r1cs, witness, n_pub = compute
    with open(GOLDEN) as f:
        proof = proof_mod.from_json(f.read())
    assert runner.verify_with_witness(
        r1cs, witness[:n_pub], proof, digest="poseidon"
    )


def test_blake_verifier_rejects_poseidon_proof(compute):
    r1cs, witness, n_pub = compute
    with open(GOLDEN) as f:
        proof = proof_mod.from_json(f.read())
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_witness(r1cs, witness[:n_pub], proof)


def test_poseidon_verifier_rejects_blake_proof(compute):
    r1cs, witness, n_pub = compute
    with open(os.path.join(FIX, "compute_proof_golden.json")) as f:
        proof = proof_mod.from_json(f.read())
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_witness(
            r1cs, witness[:n_pub], proof, digest="poseidon"
        )


def test_poseidon_proof_tamper_rejected(compute):
    r1cs, witness, n_pub = compute
    with open(GOLDEN) as f:
        proof = proof_mod.from_json(f.read())
    b = proof.linear_comb_branches[0]
    leaf = bytearray(b.leaf)
    leaf[0] ^= 1
    from stark_tpu.merkle.tree import MerkleProof

    proof.linear_comb_branches[0] = MerkleProof(bytes(leaf), list(b.nodes))
    with pytest.raises((ValueError, AssertionError)):
        runner.verify_with_witness(
            r1cs, witness[:n_pub], proof, digest="poseidon"
        )
