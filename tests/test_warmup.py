"""The parallel compile warmup covers the prove path (no missing or
mis-shaped targets) and a warmed prove still produces a correct proof."""

import os

from stark_tpu.protocol import runner
from stark_tpu.protocol.params import derive_params
from stark_tpu.protocol.warmup import warmup_prover, warmup_targets
from stark_tpu.r1cs.arithmetize import arithmetize
from stark_tpu.r1cs.reader import read_r1cs, read_witness

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _compute():
    with open(os.path.join(FIXTURES, "compute.r1cs"), "rb") as f:
        r1cs = read_r1cs(f.read())
    with open(os.path.join(FIXTURES, "compute.wtns"), "rb") as f:
        witness = read_witness(f.read())
    return r1cs, witness


def test_warmup_then_prove_verify():
    r1cs, witness = _compute()
    h = r1cs.header
    spec = runner._spec_for(r1cs)
    n_pub = 1 + h.n_public_inputs + h.n_public_outputs
    arith = arithmetize(spec, r1cs.constraints, None, h.n_wires, n_pub)
    params = derive_params(spec, arith.original_steps)

    n = warmup_prover(
        spec,
        params.steps,
        params.precision,
        arith.original_steps,
        len(arith.public_first_indices),
        threads=8,
    )
    assert n >= 20  # prover stages + FRI rounds + branch gathers

    proof = runner.prove_with_witness(r1cs, witness)
    assert runner.verify_with_witness(r1cs, witness[:n_pub], proof)


def test_warmup_targets_lower():
    """Every target lowers with its declared avals (catches shape drift
    between the warm list and the real call sites without compiling)."""
    r1cs, _ = _compute()
    h = r1cs.header
    spec = runner._spec_for(r1cs)
    n_pub = 1 + h.n_public_inputs + h.n_public_outputs
    arith = arithmetize(spec, r1cs.constraints, None, h.n_wires, n_pub)
    params = derive_params(spec, arith.original_steps)
    targets = warmup_targets(
        spec,
        params.steps,
        params.precision,
        arith.original_steps,
        len(arith.public_first_indices),
    )
    for fn, args in targets:
        fn.lower(*args)
