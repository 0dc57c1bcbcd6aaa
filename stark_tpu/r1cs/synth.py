"""Synthetic R1CS circuit generators (benchmarking / multi-chip dry runs).

The reference benches only on fixed circom fixtures; for scaling studies we
need circuits of arbitrary size. `squaring_chain(n)` builds the classic
x_{i+1} = x_i^2 chain: n constraints, n+2 wires, witness generated from a
seed -- every constraint is satisfied by construction.
"""

from __future__ import annotations

from stark_tpu.fields.field import BN254_FR, FieldSpec
from stark_tpu.r1cs.reader import Coefficient, Constraint, Factor, Header, R1csContents

_ONE_LE = (1).to_bytes(32, "little")


def _factor(wire_id: int, value: bytes = _ONE_LE) -> Factor:
    return Factor(1, [Coefficient(wire_id, value)])


def squaring_chain(
    n_constraints: int, x0: int = 3, spec: FieldSpec = BN254_FR
) -> tuple[R1csContents, list[bytes]]:
    """R1CS + witness for x_{i+1} = x_i * x_i, i < n.

    Wires: [0]=1 (constant), [1]=x_n (public output), [2]=x_0, [3..]=x_1..
    Returns (R1csContents, witness_bytes) in the same shapes the file
    readers produce."""
    p = spec.p
    xs = [x0 % p]
    for _ in range(n_constraints):
        xs.append(xs[-1] * xs[-1] % p)
    # wire layout: w0=1, w1=x_n, w2..w_{n+1}=x_0..x_{n-1}
    wires = [1, xs[-1]] + xs[:-1]

    def wire_of(i: int) -> int:  # wire holding x_i
        return 1 if i == n_constraints else 2 + i

    constraints = []
    for i in range(n_constraints):
        constraints.append(
            Constraint(
                [
                    _factor(wire_of(i)),
                    _factor(wire_of(i)),
                    _factor(wire_of(i + 1)),
                ]
            )
        )

    header = Header(
        field_size=32,
        prime_number=p.to_bytes(32, "little"),
        n_wires=len(wires),
        n_public_outputs=1,
        n_public_inputs=0,
        n_private_inputs=1,
        n_labels=len(wires),
        n_constraints=n_constraints,
    )
    witness = [
        v.to_bytes(max(1, (v.bit_length() + 7) // 8), "little") for v in wires
    ]
    return R1csContents(1, header, constraints), witness
