"""Blake2s Merkle commitment: device leaf hashing + log-depth fold.

One builder replaces the reference's three tree variants
(`SerialMerkleTree`, `ParallelMerkleTree`, `MerkleProofInPlace` --
`/root/reference/packages/commitment/src/{serial_merkle_tree.rs,
pallarel_merkle_tree.rs,merkle_proof_in_place.rs}`): all three produce the
same root/proofs (their own differential test,
`merkle_proof_in_place.rs:208-261`, asserts it), so the TPU build hashes
every layer as one batched kernel and keeps the layers for proof assembly.

Tree shape (power-of-two leaf count, as the prover always commits
power-of-two domains):
  layer0[i] = blake2s(leaf_i); layer_{k+1}[i] = blake2s(layer_k[2i] ||
  layer_k[2i+1]); root = last layer[0].
Proofs are bottom-up sibling lists validated by the index-parity walk
(`merkle_tree.rs:25-43`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from stark_tpu.ops import blake2s as b2
from stark_tpu.protocol.transcript import blake


@dataclass
class MerkleProof:
    """= reference `Proof { leaf, nodes }` (`merkle_tree.rs:14-18`)."""

    leaf: bytes
    nodes: list[bytes]


class MerkleTree:
    """Committed tree with all digest layers held on host for proof gen."""

    def __init__(self, leaves_np: np.ndarray, layers: list[np.ndarray]):
        self.leaves = leaves_np  # (N, leaf_bytes) uint8
        self.layers = layers  # each (n_i, 32) uint8

    @property
    def width(self) -> int:
        return self.leaves.shape[0]

    @property
    def root(self) -> bytes:
        return self.layers[-1][0].tobytes()

    def gen_proofs(self, indices) -> list[MerkleProof]:
        proofs = []
        for idx in indices:
            idx = int(idx)
            nodes = []
            t = idx
            for layer in self.layers[:-1]:
                nodes.append(layer[t ^ 1].tobytes())
                t //= 2
            proofs.append(MerkleProof(self.leaves[idx].tobytes(), nodes))
        return proofs


def commit_np(leaves_np: np.ndarray) -> MerkleTree:
    """Build the tree on device from (N, leaf_bytes) uint8 leaves."""
    n, leaf_bytes = leaves_np.shape
    assert n & (n - 1) == 0, "power-of-two leaf count required"
    words = jnp.asarray(b2.bytes_to_words_np(leaves_np, leaf_bytes))
    digests = b2.blake2s_words(words, leaf_bytes)  # (8, N)
    layers = [b2.digest_words_to_bytes_np(digests)]
    cur = digests
    while cur.shape[1] > 1:
        # pair (2i, 2i+1): message = 16 words (left digest || right digest)
        m = cur.reshape(8, cur.shape[1] // 2, 2)
        msg = jnp.concatenate([m[:, :, 0], m[:, :, 1]], axis=0)  # (16, n/2)
        cur = b2.blake2s_words(msg, 64)
        layers.append(b2.digest_words_to_bytes_np(cur))
    return MerkleTree(leaves_np, layers)


def commit(leaves: list[bytes]) -> MerkleTree:
    arr = np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(
        len(leaves), len(leaves[0])
    )
    return commit_np(arr)


def validate_proof(proof: MerkleProof, root: bytes, index: int) -> bytes:
    """Index-parity sibling walk (`merkle_tree.rs:25-43`); raises on failure."""
    current = blake(proof.leaf)
    t = index
    for node in proof.nodes:
        if t % 2 == 0:
            current = blake(current + node)
        else:
            current = blake(node + current)
        t //= 2
    if current != root:
        raise ValueError("merkle proof validation failed")
    return proof.leaf


def verify_multi_branch(root: bytes, indices, proofs: list[MerkleProof]) -> list[bytes]:
    # merkle_tree.rs:46-58
    return [validate_proof(p, root, int(i)) for i, p in zip(indices, proofs)]
