"""FRI prove/verify round-trip and tamper tests over BN254."""

import random

import pytest

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.fri import fri
from stark_tpu.merkle import tree as mt
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import ntt as nttmod


def _poly_evals(n, deg, seed=0, shift_by_excluded=False):
    """Evaluations on the order-n domain of a random poly of degree < deg."""
    rng = random.Random(seed)
    coeffs = [rng.randrange(spec.p) for _ in range(deg)]
    w = spec.root_of_unity(n)
    cm = mm.to_mont(spec, mm.ints_to_limbs_np(coeffs, spec))
    table = nttmod.forward_table(spec, w, n)
    evals = nttmod.ntt(spec, nttmod.zero_pad(cm, n), table)
    return evals, w


@pytest.mark.parametrize("exclude", [0, 8])
def test_fri_roundtrip(exclude):
    n = 256
    max_deg_plus_1 = n // 4
    evals, w = _poly_evals(n, max_deg_plus_1, seed=exclude)
    xs_full = mm.power_table(spec, w, n)
    proof = fri.prove_low_degree(spec, evals, xs_full, max_deg_plus_1, exclude)
    # level-0 commitment root (what the outer protocol stores as l_root)
    root = mt.commit_np(fri._canonical_bytes(spec, evals)).root
    assert fri.verify_low_degree_proof(spec, root, w, proof, max_deg_plus_1, exclude)
    # structure: middles then one last
    assert isinstance(proof[-1], fri.FriLast)
    assert all(isinstance(x, fri.FriMiddle) for x in proof[:-1])


def test_fri_rejects_high_degree():
    n = 256
    max_deg_plus_1 = n // 4
    # degree-(n/2) polynomial: too high for the claimed bound
    evals, w = _poly_evals(n, n // 2, seed=3)
    xs_full = mm.power_table(spec, w, n)
    proof = fri.prove_low_degree(spec, evals, xs_full, max_deg_plus_1, 0)
    root = mt.commit_np(fri._canonical_bytes(spec, evals)).root
    with pytest.raises(ValueError):
        fri.verify_low_degree_proof(spec, root, w, proof, max_deg_plus_1, 0)


def test_fri_rejects_tampered_proof():
    n = 256
    max_deg_plus_1 = n // 4
    evals, w = _poly_evals(n, max_deg_plus_1, seed=1)
    xs_full = mm.power_table(spec, w, n)
    proof = fri.prove_low_degree(spec, evals, xs_full, max_deg_plus_1, 0)
    root = mt.commit_np(fri._canonical_bytes(spec, evals)).root
    # flip a byte in one column branch leaf
    tampered = proof[0].column_branches[0]
    bad_leaf = bytes([tampered.leaf[0] ^ 1]) + tampered.leaf[1:]
    proof[0].column_branches[0] = mt.MerkleProof(bad_leaf, tampered.nodes)
    with pytest.raises(ValueError):
        fri.verify_low_degree_proof(spec, root, w, proof, max_deg_plus_1, 0)


def test_fold_dft_matches_lagrange(monkeypatch):
    """The radix-4 IDFT fold (coset structure, no inversion) must produce
    the exact field values of the general Lagrange route (fri.rs:141-164
    semantics via quartic.multi_interp_4)."""
    import numpy as np

    n = 512
    evals, w = _poly_evals(n, n // 4, seed=3)
    xs = mm.power_table(spec, w, n)
    sx = mm.mont_consts(spec, [123456789])[:, :, None]
    monkeypatch.setenv("STARK_TPU_FRI_LAGRANGE", "1")
    old = np.asarray(fri._fold_j(spec, evals, xs, sx))
    monkeypatch.setenv("STARK_TPU_FRI_LAGRANGE", "0")
    # env is read at TRACE time; clear the jit cache so both paths trace
    fri._fold_j.clear_cache()
    new = np.asarray(fri._fold_j(spec, evals, xs, sx))
    fri._fold_j.clear_cache()
    assert (old == new).all()
