"""R1CS/wtns parser tests against the reference's golden files."""

import json
import os

from stark_tpu.fields.field import BN254_FR
from stark_tpu.r1cs.arithmetize import arithmetize
from stark_tpu.r1cs.reader import read_r1cs, read_witness

import pytest

pytestmark = pytest.mark.quick

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_read_r1cs_golden():
    # golden JSON from the reference (compute.r1cs.json, reader.rs:44-62)
    r1cs = read_r1cs(_load("compute.r1cs"))
    golden = json.loads(_load("compute.r1cs.json"))
    assert r1cs.version == golden["version"]
    gh = golden["header"]
    h = r1cs.header
    assert h.field_size == gh["field_size"]
    assert list(h.prime_number) == gh["prime_number"]
    assert h.n_wires == gh["n_wires"]
    assert h.n_public_outputs == gh["n_public_outputs"]
    assert h.n_public_inputs == gh["n_public_inputs"]
    assert h.n_private_inputs == gh["n_private_inputs"]
    assert h.n_labels == gh["n_labels"]
    assert h.n_constraints == gh["n_constraints"]
    assert len(r1cs.constraints) == len(golden["constraints"])
    for c, gc in zip(r1cs.constraints, golden["constraints"]):
        for f, gf in zip(c.factors, gc["factors"]):
            assert f.n_coefficient == gf["n_coefficient"]
            for coeff, gcoeff in zip(f.coefficients, gf["coefficients"]):
                assert coeff.wire_id == gcoeff["wire_id"]
                assert list(coeff.value) == gcoeff["value"]


def test_read_witness_kat():
    # r1cs-stark/src/reader.rs:64-89
    witness = read_witness(_load("compute.wtns"))
    assert witness == [
        bytes([1]),
        bytes(
            [
                135, 136, 135, 103, 17, 74, 207, 218, 212, 163, 232, 164, 38,
                238, 216, 34, 56, 221, 180, 135, 36, 249, 144, 247, 19, 79,
                126, 26, 164, 114, 177, 5,
            ]
        ),
        bytes([17]),
        bytes([33, 1]),
        bytes([49, 19]),
    ]


def test_arithmetize_compute():
    spec = BN254_FR
    r1cs = read_r1cs(_load("compute.r1cs"))
    witness = [spec.from_bytes_le(w) for w in read_witness(_load("compute.wtns"))]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 3)

    n = arith.original_steps
    assert n % 3 == 0
    a_len = n // 3
    assert len(arith.witness_trace) == n
    assert len(arith.computational_trace) == n

    # the running dot product per region must satisfy A*B=C at each
    # constraint's last slot
    for last in arith.last_coeff_list:
        a_val = arith.computational_trace[last]
        b_val = arith.computational_trace[last + a_len]
        c_val = arith.computational_trace[last + 2 * a_len]
        assert a_val * b_val % spec.p == c_val

    # permutation is a bijection on slots sharing a wire: applying it
    # repeatedly from any slot returns to the start (cyclic linked lists)
    perm = arith.permuted_indices
    seen = set()
    for start in range(n):
        if start in seen:
            continue
        cur, cycle = start, []
        while True:
            cycle.append(cur)
            cur = perm[cur]
            if cur == start:
                break
            assert len(cycle) <= n
        seen.update(cycle)
        # all slots in a cycle carry the same witness value
        vals = {arith.witness_trace[i] for i in cycle}
        assert len(vals) == 1

    # flags: F1 zero exactly at first slots (all 3 regions), F2 one at lasts
    firsts = {(l + 1) % a_len for l in arith.last_coeff_list}
    for j in range(a_len):
        expect = 0 if j in firsts else 1
        assert arith.flag1[j] == expect
        assert arith.flag1[j + a_len] == expect
        assert arith.flag1[j + 2 * a_len] == expect
    for last in arith.last_coeff_list:
        assert arith.flag2[last] == 1
    assert sum(arith.flag2) == len(arith.last_coeff_list)
