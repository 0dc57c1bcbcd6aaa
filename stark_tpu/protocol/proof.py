"""STARK proof container + serde_json-compatible JSON codec.

Mirrors the reference's `StarkProof<H>` (`r1cs-stark/src/utils.rs:122-130`)
and serde_json's layout exactly, so proofs are byte-interchangeable:

* `BlakeDigest(Vec<u8>)` (newtype struct) -> JSON array of byte ints
* `Proof { leaf, nodes }` -> {"leaf":[...],"nodes":[[...],...]}
* `FriProof` (externally tagged enum) -> {"Middle":{...}} / {"Last":{...}}
* `StarkProof` -> fields in declaration order: m_root, l_root, a_root,
  main_branches, linear_comb_branches, fri_proof
* serde_json::to_string -> compact separators, no whitespace
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from stark_tpu.fri.fri import FriLast, FriMiddle
from stark_tpu.merkle.tree import MerkleProof


@dataclass
class StarkProof:
    m_root: bytes
    l_root: bytes
    a_root: bytes
    main_branches: list[MerkleProof]
    linear_comb_branches: list[MerkleProof]
    fri_proof: list  # FriMiddle | FriLast


def _bytes_json(b: bytes):
    return list(b)


def _proof_json(p: MerkleProof):
    return {"leaf": _bytes_json(p.leaf), "nodes": [_bytes_json(n) for n in p.nodes]}


def _fri_json(f):
    if isinstance(f, FriMiddle):
        return {
            "Middle": {
                "root2": _bytes_json(f.root2),
                "column_branches": [_proof_json(p) for p in f.column_branches],
                "poly_branches": [_proof_json(p) for p in f.poly_branches],
            }
        }
    return {"Last": {"last": [_bytes_json(v) for v in f.last]}}


def to_json(proof: StarkProof) -> str:
    obj = {
        "m_root": _bytes_json(proof.m_root),
        "l_root": _bytes_json(proof.l_root),
        "a_root": _bytes_json(proof.a_root),
        "main_branches": [_proof_json(p) for p in proof.main_branches],
        "linear_comb_branches": [_proof_json(p) for p in proof.linear_comb_branches],
        "fri_proof": [_fri_json(f) for f in proof.fri_proof],
    }
    return json.dumps(obj, separators=(",", ":"))


def _bytes_from(arr) -> bytes:
    return bytes(arr)


def _proof_from(obj) -> MerkleProof:
    return MerkleProof(
        leaf=_bytes_from(obj["leaf"]), nodes=[_bytes_from(n) for n in obj["nodes"]]
    )


def _fri_from(obj):
    if "Middle" in obj:
        m = obj["Middle"]
        return FriMiddle(
            root2=_bytes_from(m["root2"]),
            column_branches=[_proof_from(p) for p in m["column_branches"]],
            poly_branches=[_proof_from(p) for p in m["poly_branches"]],
        )
    return FriLast(last=[_bytes_from(v) for v in obj["Last"]["last"]])


def from_json(text: str) -> StarkProof:
    """Parse an UNTRUSTED proof. Any structural defect (bad JSON, missing
    keys, byte values outside 0..255, wrong nesting) raises ValueError;
    count/length checks happen in `verify._validate_proof_shape` before any
    cryptographic work."""
    try:
        obj = json.loads(text)
        return StarkProof(
            m_root=_bytes_from(obj["m_root"]),
            l_root=_bytes_from(obj["l_root"]),
            a_root=_bytes_from(obj["a_root"]),
            main_branches=[_proof_from(p) for p in obj["main_branches"]],
            linear_comb_branches=[
                _proof_from(p) for p in obj["linear_comb_branches"]
            ],
            fri_proof=[_fri_from(f) for f in obj["fri_proof"]],
        )
    except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
        raise ValueError(f"malformed proof JSON: {e}") from None
