"""Poseidon digest: reference KATs (`poseidon.rs:65-113`) + device parity."""

import numpy as np
import pytest

from stark_tpu.fields.field import BLS12_381_FR as SPEC
from stark_tpu.ops import modmath as mm
from stark_tpu.ops.poseidon import (
    poseidon_digest,
    poseidon_hash_pairs,
    round_constants,
)

pytestmark = pytest.mark.quick

# (message length, expected hex digest) -- message = bytes(range(n)) padded
# with zeros to 64 bytes, exactly as the reference tests construct it.
KATS = [
    (3, "b3a1a3cfaebc3a557d52dd3e25076f7f7b51f2bf46f5289d66c389b51477ec25"),
    (32, "0e67a788ec648e60632957f8d10b71f12fba0050a7688bdad9de2e78dbf5495b"),
    (63, "ddae0004ffee05d6da43777af82faa1f0c6ac08d7048f9a4ddf6d2b259f7075e"),
    (64, "93bde2916aec7310f6e07faa70f14ed0c173832adcc03aeaed230f94540f0632"),
]


@pytest.mark.parametrize("n,want", KATS)
def test_poseidon_kat(n, want):
    msg = bytes(range(n)) + b"\x00" * (64 - n)
    assert poseidon_digest(msg).hex() == want


def test_poseidon_oversize_raises():
    # reference: assert!(message_len <= 64) panics (`poseidon.rs:33,109-113`)
    with pytest.raises(ValueError):
        poseidon_digest(bytes(range(65)))


def test_round_constants_count_and_range():
    rc = round_constants()
    assert len(rc) == 3 * (8 + 55)
    assert all(0 <= c < SPEC.p for c in rc)
    assert len(set(rc)) == len(rc)  # no repeats expected from the LFSR


def test_poseidon_merkle_tree():
    """Digest-pluggable Merkle (reference `H: Digest`, `merkle_tree.rs:60-73`)
    with 32-byte leaves, root/proofs verified by the host walk."""
    from stark_tpu.merkle.tree import commit, validate_proof, verify_multi_branch

    leaves = [SPEC.to_bytes_le(i * 1234567 + 1) for i in range(8)]
    tree = commit(leaves, digest="poseidon")
    # root equals a serial host fold
    layer = [poseidon_digest(leaf) for leaf in leaves]
    while len(layer) > 1:
        layer = [
            poseidon_digest(layer[2 * i] + layer[2 * i + 1])
            for i in range(len(layer) // 2)
        ]
    assert tree.root == layer[0]
    idx = [0, 5, 7]
    proofs = tree.gen_proofs(idx)
    got = verify_multi_branch(tree.root, idx, proofs, digest="poseidon")
    assert got == [leaves[i] for i in idx]
    bad = MerkleProofBadWrap(proofs[0])
    with pytest.raises(ValueError):
        validate_proof(bad, tree.root, 1, digest="poseidon")  # wrong index


class MerkleProofBadWrap:
    def __init__(self, p):
        self.leaf = p.leaf
        self.nodes = p.nodes


def test_device_pairs_match_host():
    rng = np.random.default_rng(7)
    n = 5
    lefts = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    rights = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    left = mm.ints_to_limbs_np(lefts, SPEC)
    right = mm.ints_to_limbs_np(rights, SPEC)
    got = mm.limbs_to_ints_np(np.asarray(poseidon_hash_pairs(SPEC, left, right)), SPEC)
    for i in range(n):
        msg = SPEC.to_bytes_le(lefts[i]) + SPEC.to_bytes_le(rights[i])
        want = int.from_bytes(poseidon_digest(msg), "little")
        assert got[i] == want
