"""Pipelined serving mode: prove_many yields the same bytes as one-at-a-time
proving and every proof verifies."""

import os

from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner
from stark_tpu.r1cs.reader import read_r1cs, read_witness

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_prove_many_matches_single():
    with open(os.path.join(FIXTURES, "compute.r1cs"), "rb") as f:
        r1cs = read_r1cs(f.read())
    with open(os.path.join(FIXTURES, "compute.wtns"), "rb") as f:
        witness = read_witness(f.read())

    single = runner.prove_with_witness(r1cs, witness)
    many = runner.prove_many(r1cs, [witness] * 3, pipeline=2)
    assert len(many) == 3

    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
    ref_json = proof_mod.to_json(single)
    for pf in many:
        assert proof_mod.to_json(pf) == ref_json  # deterministic transcript
        assert runner.verify_with_witness(r1cs, witness[:n_pub], pf)
