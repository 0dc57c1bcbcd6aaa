"""The staged prover produces identical roots with the MXU (CRT matmul)
LDE backend and the default butterfly backend."""

import numpy as np
import jax
import pytest


def _run_staged(monkeypatch, mxu: str):
    monkeypatch.setenv("STARK_TPU_MXU", mxu)
    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.protocol.core import build_staged_prover, make_example_inputs
    from stark_tpu.protocol.params import derive_params
    from stark_tpu.r1cs.arithmetize import arithmetize
    from stark_tpu.r1cs.synth import squaring_chain

    r1cs, wb = squaring_chain(20)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    fn = build_staged_prover(
        spec, params.steps, params.precision, arith.original_steps
    )
    args = make_example_inputs(spec, arith, witness[:2], params)
    m_root, l_root, l_ev = fn(*args)
    jax.block_until_ready((m_root, l_root))
    return np.asarray(m_root), np.asarray(l_root), np.asarray(l_ev)


def test_staged_prover_mxu_matches_default(monkeypatch):
    m0, l0, e0 = _run_staged(monkeypatch, "0")
    m1, l1, e1 = _run_staged(monkeypatch, "force")
    assert (m0 == m1).all()
    assert (l0 == l1).all()
    assert (e0 == e1).all()


def _full_proof_json(monkeypatch, mxu: str, fuse_max=None):
    monkeypatch.setenv("STARK_TPU_MXU", mxu)
    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.protocol import core, proof as proof_mod
    from stark_tpu.protocol.prove import mk_r1cs_proof
    from stark_tpu.r1cs.arithmetize import arithmetize
    from stark_tpu.r1cs.synth import squaring_chain

    if fuse_max is not None:
        monkeypatch.setattr(core, "_MXU_FUSE_MAX_PRECISION", fuse_max)
    r1cs, wb = squaring_chain(20)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    proof = mk_r1cs_proof(spec, arith, witness[:2], 20, r1cs.header.n_wires)
    return proof_mod.to_json(proof)


def test_mxu_per_column_dispatch_matches_fused(monkeypatch):
    """precision > _MXU_FUSE_MAX_PRECISION dispatches one column per jit
    call (the >2^20 HBM path, protocol/core.py); the proof must be
    byte-identical to the fused-module and butterfly-engine proofs."""
    base = _full_proof_json(monkeypatch, "0")
    fused = _full_proof_json(monkeypatch, "force")
    per_col = _full_proof_json(monkeypatch, "force", fuse_max=1)
    assert fused == base
    assert per_col == base
