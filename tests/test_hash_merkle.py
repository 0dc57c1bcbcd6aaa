"""Blake2s + transcript + Merkle tests, pinned to the reference's KATs."""

import hashlib
import random

import numpy as np
import pytest

from stark_tpu.merkle import tree as mt
from stark_tpu.ops import blake2s as b2
from stark_tpu.protocol import transcript as ts

pytestmark = pytest.mark.quick


def test_blake_kat():
    # commitment/src/utils.rs:12-24
    a1 = bytes.fromhex(
        "9aec6806794561107e594b1f6a8a6b0c92a0cba9acf5e5e93cca06f781813b0b"
    )
    a2 = bytes.fromhex(
        "8ea974646c2be3c16f9f52a2e5ebb3d2df7ba184a6440e47fc6fcce6e9d9bdc4"
    )
    assert ts.blake(b"hello world") == a1
    assert ts.blake(a1) == a2


@pytest.mark.parametrize("msg_len", [4, 32, 40, 64, 256])
def test_device_blake2s_matches_hashlib(msg_len):
    rng = np.random.default_rng(msg_len)
    n = 16
    msgs = rng.integers(0, 256, size=(n, msg_len), dtype=np.uint8)
    words = b2.bytes_to_words_np(msgs, msg_len)
    digests = b2.digest_words_to_bytes_np(b2.blake2s_words(words, msg_len))
    for i in range(n):
        assert digests[i].tobytes() == hashlib.blake2s(msgs[i].tobytes()).digest()


def test_pseudorandom_indices_kats():
    # commitment/src/utils.rs:111-120
    assert ts.get_pseudorandom_indices(ts.blake(b"hello world"), 7, 5, 0) == [
        5, 5, 5, 3, 5,
    ]
    assert ts.get_pseudorandom_indices(
        ts.blake(b"hello another world"), 7, 20, 0
    ) == [3, 0, 2, 4, 4, 1, 4, 2, 5, 1, 3, 2, 1, 0, 0, 1, 6, 5, 2, 3]


def test_pseudorandom_indices_exclude_multiples():
    # exclude_multiples_of=k must never emit a multiple of k and must stay
    # within the remapped range (commitment/src/utils.rs:101-108)
    out = ts.get_pseudorandom_indices(ts.blake(b"seed"), 64, 100, 8)
    assert all(v % 8 != 0 for v in out)
    assert all(0 < v < 64 for v in out)


def test_merkle_root_kat_16():
    # pallarel_merkle_tree.rs:132-178 (Blake, 16 leaves, index 2)
    leaves = [bytes.fromhex(format(v, "08x")) for v in [
        0x7FFFFFFF, 0x80000000, 0x00000003, 0x00000000,
        0x7FFFFFFE, 0x80000001, 0x00000004, 0x00000001,
        0x7FFFFFFD, 0x80000002, 0x00000005, 0x00000002,
        0x7FFFFFFC, 0x80000003, 0x00000006, 0x00000003,
    ]]
    tree = mt.commit(leaves)
    assert tree.root.hex() == (
        "9f04496db6a8c505e88a7db289161a540a0cb953ef81c9b86103f0d6d12e8e15"
    )
    proof = tree.gen_proofs([2])[0]
    assert proof.leaf == bytes.fromhex("00000003")
    assert [n.hex() for n in proof.nodes] == [
        "4cd90cc0d54239ee5b3fd9989b4ef4cbebbbdd08410758cbd2d291fa364c82d5",
        "2e3d3579213e0a992d60b503f1d8fe331b8bd548e227e8dbd741ca1752077b84",
        "9a8c87bb98f1b2e0f7036a27a343dc8fd649bedc737093c2080a34c6b9f6f375",
        "ef459d75e20ce2f3fc4378ff20fe2d594fbcf16cccd986c2e0d3df41bd3bbe44",
    ]
    assert mt.validate_proof(proof, tree.root, 2) == proof.leaf


def test_merkle_root_kat_4096():
    # pallarel_merkle_tree.rs:181-215 (4096 identical leaves)
    leaves = [bytes.fromhex("7fffffff")] * (1 << 12)
    tree = mt.commit(leaves)
    assert tree.root.hex() == (
        "a0d91c3115f9e4d9f142e7cb2f413c10f0f2f9f65d9f918b80f852f9ebc06ebc"
    )
    proofs = tree.gen_proofs([2, 7, 13])
    assert proofs[0].leaf == bytes.fromhex("7fffffff")
    assert proofs[0].nodes[0].hex() == (
        "b72b5371ceffa4e01aa1849cdb8705406e14791db359f826bc01a392ed26b6b9"
    )
    mt.verify_multi_branch(tree.root, [2, 7, 13], proofs)


def _oracle_tree(leaves):
    """Slow host oracle replicating SerialMerkleTree (serial_merkle_tree.rs)."""
    layers = [[hashlib.blake2s(l).digest() for l in leaves]]
    while len(layers[-1]) >= 2:
        cur = layers[-1]
        layers.append(
            [hashlib.blake2s(cur[i] + cur[i + 1]).digest() for i in range(0, len(cur), 2)]
        )
    return layers


def test_merkle_differential_vs_oracle():
    rng = random.Random(99)
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(64)]
    tree = mt.commit(leaves)
    oracle = _oracle_tree(leaves)
    assert tree.root == oracle[-1][0]
    indices = [10, 4, 6, 3, 6, 8]
    proofs = tree.gen_proofs(indices)
    for idx, proof in zip(indices, proofs):
        assert proof.leaf == leaves[idx]
        t = idx
        for lvl, node in enumerate(proof.nodes):
            assert node == oracle[lvl][t ^ 1]
            t //= 2
    mt.verify_multi_branch(tree.root, indices, proofs)


def test_merkle_tamper_rejected():
    leaves = [bytes([i] * 32) for i in range(8)]
    tree = mt.commit(leaves)
    proof = tree.gen_proofs([3])[0]
    bad = mt.MerkleProof(leaf=b"\xff" * 32, nodes=proof.nodes)
    with pytest.raises(ValueError):
        mt.validate_proof(bad, tree.root, 3)


def test_mk_seed_and_random_ff_values():
    from stark_tpu.fields.field import BN254_FR

    # mk_seed = decimal of BE integer of blake digest (utils.rs:51-57)
    seed = ts.mk_seed([b"hello ", b"world"])
    assert seed == str(int.from_bytes(ts.blake(b"hello world"), "big"))
    vals = ts.get_random_ff_values(BN254_FR, ts.blake(b"x"), 1 << 20, 3, 0)
    assert len(vals) == 3
    assert all(0 <= v < BN254_FR.p for v in vals)
    # deterministic
    assert vals == ts.get_random_ff_values(BN254_FR, ts.blake(b"x"), 1 << 20, 3, 0)


def test_device_tree_release_after_gather():
    """release_device drops the device arrays after branch gathers are
    dispatched; proof formatting from the gathered flat must still work
    and validate (the 2^23 prover relies on this to fit HBM)."""
    import numpy as np
    import random as _r

    rng = _r.Random(7)
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(64)]
    arr = np.frombuffer(b"".join(leaves), np.uint8).reshape(64, 32)
    words = np.zeros((16, 64), np.uint32)
    words[:8] = arr.view("<u4").T
    tree = mt.commit_words_jit(words, 32)
    root = tree.root
    indices = [3, 9, 41]
    flat = np.asarray(tree._gather_device(indices)).astype("<u4")
    tree.release_device()
    proofs = tree._proofs_from_flat(flat, len(indices))
    for idx, proof in zip(indices, proofs):
        assert proof.leaf == leaves[idx]
    mt.verify_multi_branch(root, indices, proofs)


def _oracle_tree_odd(leaves):
    """SerialMerkleTree with chunks(2) semantics: a lone trailing node
    hashes ALONE (serial_merkle_tree.rs:62-83)."""
    layers = [[hashlib.blake2s(l).digest() for l in leaves]]
    while len(layers[-1]) >= 2:
        cur = layers[-1]
        nxt = [
            hashlib.blake2s(b"".join(cur[i : i + 2])).digest()
            for i in range(0, len(cur), 2)
        ]
        layers.append(nxt)
    return layers


@pytest.mark.parametrize("n", [3, 5, 7, 12, 33])
def test_merkle_non_power_of_two_widths(n):
    """serial_merkle_tree.rs:62-83 parity: odd layer widths fold with a
    lone-tail hash; branches exist only where every level has a sibling
    (the reference's own gen_proof panics otherwise)."""
    rng = random.Random(n)
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    tree = mt.commit(leaves)
    oracle = _oracle_tree_odd(leaves)
    assert tree.root == oracle[-1][0]
    assert tree.width == n

    # index 0 always has a sibling at every level when n >= 2
    proof = tree.gen_proofs([0])[0]
    t = 0
    for lvl, node in enumerate(proof.nodes):
        assert node == oracle[lvl][t ^ 1]
        t //= 2

    if n % 2:
        # the lone tail leaf has no sibling: clean error (reference panics)
        with pytest.raises(ValueError, match="no sibling"):
            tree.gen_proofs([n - 1])


def test_merkle_non_power_of_two_poseidon():
    from stark_tpu.ops.poseidon import poseidon_digest

    leaves = [bytes([i] * 32) for i in range(5)]
    tree = mt.commit(leaves, "poseidon")
    layers = [[poseidon_digest(l) for l in leaves]]
    while len(layers[-1]) >= 2:
        cur = layers[-1]
        layers.append(
            [
                poseidon_digest(b"".join(cur[i : i + 2]))
                for i in range(0, len(cur), 2)
            ]
        )
    assert tree.root == layers[-1][0]
