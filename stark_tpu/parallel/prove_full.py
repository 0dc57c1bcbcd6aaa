"""Complete mesh-sharded prover: a full `StarkProof` from a device mesh.

Extends the sharded core step (`prove_sharded.py`) to the *whole* of
`mk_r1cs_proof` (`/root/reference/packages/r1cs-stark/src/prove.rs:14-378`):
the a-tree commit, both Merkle trees with their layers (for branch
generation), the Fiat-Shamir round trips, spot-check branch gathering, and
the FRI recursion all execute on the mesh.

Sharding strategy (the reference's one crossbeam axis, generalized):

* the explicit shard_map stage computes the LDE columns with the four-step
  NTT + ppermute rolls (`prove_sharded._columns_body`);
* everything downstream -- leaf packing, blake2s tree layers, the linear
  combination, the FRI quartic folds -- is data-parallel jnp code operating
  on the GLOBAL sharded arrays, so XLA's SPMD partitioner keeps each op
  local to its shard and inserts the few collectives (the fold-to-root top
  levels, FRI's strided reshapes) automatically. This is the idiomatic
  JAX scale-out shape: annotate the shardings, let the compiler place the
  collectives.
* Merkle branch gathering stays on device (`DeviceMerkleTree.gen_proofs`
  gathers sibling columns from the sharded layers); only the queried
  nodes ever reach the host.

The emitted proof is byte-identical to the single-device prover's (asserted
by `tests/test_parallel_full.py` on an 8-way mesh and by the driver's
`dryrun_multichip`).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stark_tpu.fields.field import FieldSpec
from stark_tpu.fri import fri
from stark_tpu.merkle import tree as mt
from stark_tpu.ops import modmath as mm
from stark_tpu.parallel import prove_sharded as ps
from stark_tpu.protocol import kernels
from stark_tpu.protocol import transcript as ts
from stark_tpu.protocol.params import SPOT_CHECK_SECURITY_FACTOR, derive_params
from stark_tpu.protocol.proof import StarkProof
from stark_tpu.protocol.prove import (
    _col_mont,
    _pad_col,
    _tile_periodic,
    augmented_positions,
)
from stark_tpu.r1cs.arithmetize import Arithmetization, arithmetize
from stark_tpu.utils import poly_host as ph
from stark_tpu.utils.tracing import phase


@contextmanager
def _xla_kernels_only():
    """The fused Pallas kernels are single-device programs; inside the
    sharded prover every op runs on global sharded arrays, so force the
    (identical-semantics) XLA paths. Per-device Pallas under shard_map is a
    separate optimization, not a correctness feature."""
    old = os.environ.get("STARK_TPU_PALLAS")
    os.environ["STARK_TPU_PALLAS"] = "0"
    try:
        yield
    finally:
        if old is None:
            del os.environ["STARK_TPU_PALLAS"]
        else:
            os.environ["STARK_TPU_PALLAS"] = old


def mk_r1cs_proof_sharded(
    spec: FieldSpec,
    arith: Arithmetization,
    public_wires: list[int],
    n_constraints: int,
    n_wires: int,
    mesh: Mesh,
) -> StarkProof:
    with _xla_kernels_only():
        return _mk_proof(spec, arith, public_wires, n_constraints, n_wires, mesh)


def _mk_proof(spec, arith, public_wires, n_constraints, n_wires, mesh):
    p = spec.p
    original_steps = arith.original_steps
    assert original_steps <= 3 * n_constraints * n_wires
    params = derive_params(spec, original_steps)
    steps, precision, skips = params.steps, params.precision, params.skips
    d = mesh.devices.size
    assert steps >= d * d, (
        f"four-step NTT needs steps >= n_devices^2 ({steps} < {d * d})"
    )

    shard = NamedSharding(mesh, P(None, "d"))
    repl = NamedSharding(mesh, P(None, None))
    put_s = lambda x: jax.device_put(x, shard)
    put_r = lambda x: jax.device_put(x, repl)

    # --- padded small-domain traces, sharded over the steps axis ---
    if isinstance(arith.permuted_indices, np.ndarray):
        permuted = np.concatenate(
            [
                arith.permuted_indices.astype(np.uint64),
                np.arange(original_steps, steps, dtype=np.uint64),
            ]
        )
    else:
        permuted = list(arith.permuted_indices) + list(range(original_steps, steps))
    with phase("traces"):
        traces = {
            "k": _col_mont(spec, _pad_col(arith.coefficients, steps)),
            "f0": _col_mont(spec, _pad_col(arith.flag0, steps)),
            "f1": _col_mont(spec, _pad_col(arith.flag1, steps)),
            "f2": _col_mont(spec, _pad_col(arith.flag2, steps)),
            "s": _col_mont(spec, _pad_col(arith.witness_trace, steps)),
            "p": _col_mont(spec, _pad_col(arith.computational_trace, steps)),
            "idx": _col_mont(spec, np.arange(steps, dtype=np.uint64)),
            "perm": _col_mont(spec, permuted),
        }
        traces = {k: put_s(v) for k, v in traces.items()}
        xs_full = put_s(mm.power_table(spec, params.g2, precision))

    # --- a-tree (utils.rs:250-270), sharded on the steps domain ---
    with phase("a_tree"):
        perm_np = np.asarray(permuted, dtype=np.uint64)
        perm_lo = jnp.asarray((perm_np & 0xFFFFFFFF).astype(np.uint32))[None]
        perm_hi = jnp.asarray((perm_np >> 32).astype(np.uint32))[None]
        canon_s = mm.from_mont(spec, traces["s"])
        s_words = canon_s[0::2] | (canon_s[1::2] << np.uint32(16))  # (8, steps)
        a_words = put_s(
            jnp.concatenate(
                [put_s(perm_lo), put_s(perm_hi), s_words,
                 jnp.zeros((6, steps), jnp.uint32)],
                axis=0,
            )
        )
        a_root = mt.commit_words(a_words, 40).root
    r = ts.get_random_ff_values(spec, a_root, precision, 3, 0)
    r_mont = put_r(mm.mont_consts(spec, r))

    # --- boundary inputs (host, O(n_public)) ---
    pub_xs = [pow(params.g2, skips * w, p) for (_, w) in arith.public_first_indices]
    pub_ys = [public_wires[k] for (k, _) in arith.public_first_indices]
    i2_mont = put_r(mm.mont_consts(spec, ph.lagrange_interp(spec, pub_xs, pub_ys)))
    pubx_mont = put_r(mm.mont_consts(spec, pub_xs))

    # --- sharded column computation (8 LDEs + acc + quotients + boundary) ---
    with phase("columns"):
        columns_fn = ps.build_sharded_columns_step(
            spec, mesh, steps, precision, original_steps
        )
        cols, q_bad = columns_fn(traces, xs_full, r_mont, i2_mont, pubx_mont)
        bad = np.asarray(q_bad)
        for i, what in enumerate(("D1", "D2", "D3")):
            if bad[i]:
                raise AssertionError(f"invalid {what}: quotient not divisible by Z")

    # --- m-tree over the sharded columns (prove.rs:235-264) ---
    with phase("m_tree"):
        m_words = ps._leaves_to_words(spec, [cols[n] for n in ps._COL_NAMES])
        m_tree = mt.commit_words(m_words, 256)
        m_root = m_tree.root

    # --- linear combination (prove.rs:274-322), elementwise on shards ---
    k_coeffs = [1] + [
        ts.seed_to_field(spec, [m_root, bytes([i])]) for i in range(1, 11)
    ]
    omega = pow(params.g2, steps, p)
    pow_scalars = [pow(omega, t, p) for t in range(skips)]
    with phase("l_tree"):
        x_to_steps = put_s(_tile_periodic(spec, pow_scalars, precision))
        l_ev = kernels.linear_combination(
            spec, put_r(mm.mont_consts(spec, k_coeffs)), x_to_steps,
            *[cols[n] for n in ps._COL_NAMES],
        )
        l_tree = mt.commit_words(ps._leaves_to_words(spec, [l_ev]), 32)
        l_root = l_tree.root

    # --- spot checks + branch gathering (prove.rs:337-362) ---
    positions = ts.get_pseudorandom_indices(
        l_root, precision, SPOT_CHECK_SECURITY_FACTOR, skips
    )
    with phase("branches"):
        linear_comb_branches = l_tree.gen_proofs(positions)
        main_branches = m_tree.gen_proofs(augmented_positions(positions, params))

    # --- FRI on the sharded linear combination (prove.rs:367) ---
    with phase("fri"):
        fri_proof = fri.prove_low_degree(spec, l_ev, xs_full, precision // 4, skips)

    return StarkProof(
        m_root=m_root,
        l_root=l_root,
        a_root=a_root,
        main_branches=main_branches,
        linear_comb_branches=linear_comb_branches,
        fri_proof=fri_proof,
    )


def prove_with_witness_sharded(r1cs, witness: list[bytes], mesh: Mesh) -> StarkProof:
    """Mesh-parallel `prove_with_witness` (run.rs:310-452): same header
    checks and arithmetization as the single-device runner, proof emitted
    from the sharded pipeline."""
    from stark_tpu.protocol.runner import _spec_for

    spec = _spec_for(r1cs)
    witness_ints = [spec.from_bytes_le(w) for w in witness]
    assert witness_ints[0] == 1, "witness[0] must be 1"  # run.rs:358
    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
    public_wires = witness_ints[:n_pub]
    arith = arithmetize(
        spec, r1cs.constraints, witness_ints, r1cs.header.n_wires, n_pub
    )
    return mk_r1cs_proof_sharded(
        spec,
        arith,
        public_wires,
        r1cs.header.n_constraints,
        r1cs.header.n_wires,
        mesh,
    )
