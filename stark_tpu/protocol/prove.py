"""The R1CS STARK prover, re-expressed as batched device kernels.

Pipeline parity with `mk_r1cs_proof` (`/root/reference/packages/r1cs-stark/
src/prove.rs:14-378`), with a TPU-first structure:

* all 9 trace columns are low-degree-extended on device (iNTT@g1, NTT@g2);
* constraint/quotient/boundary evaluations are fused element-wise kernels
  over the whole extension domain;
* Z(x) = x^steps - 1 and x^steps are PERIODIC with period EXTENSION_FACTOR
  on the evaluation domain, so their (inverse) values are 8 host scalars
  tiled on device -- no O(precision) vanishing-poly FFT or host power table
  (`prove.rs:84,128-129,287-291` materialize all of these);
* the permutation accumulator A is a batched prefix-product scan + one
  batched inversion instead of the reference's sequential loop
  (`utils.rs:293-339`);
* Merkle leaves are byte-packed exactly as the reference (256-byte m-tree
  leaves `prove.rs:235-258`, 40-byte a-tree leaves `utils.rs:250-270`) and
  hashed layer-at-a-time on device.

The Fiat-Shamir transcript (roots -> k coefficients/r values/positions) is
byte-exact with the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stark_tpu.fields.field import FieldSpec
from stark_tpu.fri import fri
from stark_tpu.merkle import tree as mt
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import ntt as nttm
from stark_tpu.protocol import kernels
from stark_tpu.protocol import transcript as ts
from stark_tpu.protocol.params import (
    SPOT_CHECK_SECURITY_FACTOR,
    DomainParams,
    derive_params,
)
from stark_tpu.protocol.proof import StarkProof
from stark_tpu.r1cs.arithmetize import Arithmetization
from stark_tpu.utils import poly_host as ph
from stark_tpu.utils.tracing import phase


def _col_mont(spec, col):
    """Column -> (L, N) Montgomery limbs. Accepts python int lists (the
    classic path), (N, 32) uint8 canonical LE byte rows (the native
    arithmetizer's output), or 1-D integer numpy arrays (< 2^64)."""
    if isinstance(col, np.ndarray):
        if col.ndim == 2 and col.dtype == np.uint8:
            return mm.to_mont(spec, jnp.asarray(mm.bytes_le_to_limbs_np(col, spec)))
        if col.ndim == 1:
            v = col.astype(np.uint64)
            limbs = np.zeros((spec.num_limbs, v.shape[0]), dtype=np.uint32)
            for i in range(4):
                limbs[i] = ((v >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
                    np.uint32
                )
            return mm.to_mont(spec, jnp.asarray(limbs))
        raise TypeError(f"unsupported column array {col.shape}/{col.dtype}")
    return mm.to_mont(spec, mm.ints_to_limbs_np(col, spec))


def _pad_col(col, steps: int):
    """Zero-pad a column (list or numpy) to `steps` entries."""
    n = len(col)
    if isinstance(col, np.ndarray):
        if n == steps:
            return col
        shape = (steps,) + col.shape[1:]
        out = np.zeros(shape, dtype=col.dtype)
        out[:n] = col
        return out
    return list(col) + [0] * (steps - n)


def _lde_column(spec, values, lde_fn):
    return lde_fn(_col_mont(spec, values))


def _tile_periodic(spec: FieldSpec, scalars: list[int], precision: int):
    """Host scalars v_0..v_{k-1} -> (L, precision) Montgomery with
    out[j] = v_{j mod k}."""
    k = len(scalars)
    base = mm.mont_consts(spec, scalars)  # (L, k)
    return jnp.tile(base, (1, precision // k))


def _canon_bytes(spec, mont_arr) -> np.ndarray:
    return mm.limbs_to_bytes_le_np(np.asarray(mm.from_mont(spec, mont_arr)), spec)


def _check_zero_at_stride(spec, q_evals, skips, what):
    """Reference divisibility asserts (`utils.rs:379-418`): Q must vanish
    wherever Z does (every skips-th position). Device reduce, one scalar
    transfer."""
    bad = np.asarray(jnp.any(q_evals[:, ::skips] != 0))
    if bad:
        raise AssertionError(f"invalid {what}: quotient not divisible by Z")


def augmented_positions(positions, params: DomainParams):
    """The 4 companion indices per spot check (`prove.rs:351-359`)."""
    out = []
    k = params.original_steps // 3 * params.skips
    for j in positions:
        out.extend(
            [
                j,
                (j + params.precision - params.skips) % params.precision,
                (j + k) % params.precision,
                (j + 2 * k) % params.precision,
            ]
        )
    return out


def mk_r1cs_proof(
    spec: FieldSpec,
    arith: Arithmetization,
    public_wires: list[int],
    n_constraints: int,
    n_wires: int,
) -> StarkProof:
    p = spec.p
    original_steps = arith.original_steps
    assert original_steps <= 3 * n_constraints * n_wires
    params = derive_params(spec, original_steps)
    steps, precision, skips = params.steps, params.precision, params.skips

    # --- pad traces to the power-of-two domain (prove.rs:55-68) ---
    if isinstance(arith.permuted_indices, np.ndarray):
        permuted = np.concatenate(
            [
                arith.permuted_indices.astype(np.uint64),
                np.arange(original_steps, steps, dtype=np.uint64),
            ]
        )
    else:
        permuted = list(arith.permuted_indices) + list(range(original_steps, steps))
    coeffs = _pad_col(arith.coefficients, steps)
    s_trace = _pad_col(arith.witness_trace, steps)
    p_trace = _pad_col(arith.computational_trace, steps)
    f0 = _pad_col(arith.flag0, steps)
    f1 = _pad_col(arith.flag1, steps)
    f2 = _pad_col(arith.flag2, steps)

    # --- domain tables ---
    xs_full = mm.power_table(spec, params.g2, precision)  # (L, precision)
    lde_fn = nttm.make_best_lde(spec, params.g1, params.g2, steps, precision)

    # --- 8 LDE columns (prove.rs:100-169) ---
    with phase("lde_columns"):
        k_ev = _lde_column(spec, coeffs, lde_fn)
        f0_ev = _lde_column(spec, f0, lde_fn)
        f1_ev = _lde_column(spec, f1, lde_fn)
        f2_ev = _lde_column(spec, f2, lde_fn)
        s_small = _col_mont(spec, s_trace)
        s_ev = lde_fn(s_small)
        p_ev = _lde_column(spec, p_trace, lde_fn)
        idx_small = _col_mont(spec, np.arange(steps, dtype=np.uint64))
        idx_ev = lde_fn(idx_small)
        perm_small = _col_mont(spec, permuted)
        perm_ev = lde_fn(perm_small)

    # --- accumulator commitment + randomness (utils.rs:250-290) ---
    with phase("a_tree"):
        # leaf = perm_idx (8B LE usize) || S value (32B LE), built as device
        # words so the whole tree stays on device (utils.rs:250-270)
        perm_np = np.asarray(permuted, dtype=np.uint64)
        perm_lo = jnp.asarray((perm_np & 0xFFFFFFFF).astype(np.uint32))[None]
        perm_hi = jnp.asarray((perm_np >> 32).astype(np.uint32))[None]
        from stark_tpu.protocol.core import _words_best

        s_words = _words_best(spec, [s_small])[:8]  # (8, steps)
        a_words = jnp.concatenate(
            [perm_lo, perm_hi, s_words, jnp.zeros((6, steps), jnp.uint32)],
            axis=0,
        )  # (16, steps): one 64-byte block per 40-byte leaf
        a_root = mt.commit_words(a_words, 40).root
    r = ts.get_random_ff_values(spec, a_root, precision, 3, 0)

    # --- permutation accumulator A (utils.rs:293-339), batched scans ---
    with phase("accumulator"):
        r_mont = mm.mont_consts(spec, r)  # (L, 3)
        val_nmr, val_dnm = kernels.rand_combination(
            spec, r_mont, idx_small, perm_small, s_small
        )
        a_mini = kernels.accumulator_mini(spec, val_nmr, val_dnm)
        a_ev = lde_fn(a_mini)

    # --- quotients Q1/Q2/Q3 (utils.rs:181-248,344-376) ---
    with phase("quotients"):
        q1 = kernels.q1_eval(spec, s_ev, k_ev, p_ev, f0_ev, f1_ev, skips)
        kshift = original_steps // 3 * skips
        q2 = kernels.q2_eval(spec, p_ev, f2_ev, kshift)
        vn_big, vd_big = kernels.rand_combination(spec, r_mont, idx_ev, perm_ev, s_ev)
        q3 = kernels.q3_eval(spec, a_ev, vn_big, vd_big, skips)

    # --- divisibility + quotients D = Q / Z ---
    # Z(g2^j) = g2^(j*steps) - 1 = omega^(j mod 8) - 1, omega = g2^steps:
    # periodic with period EXTENSION_FACTOR (the reference FFTs a sparse
    # poly to get the same values, prove.rs:128-129)
    omega = pow(params.g2, steps, p)
    z_scalars = [(pow(omega, t, p) - 1) % p for t in range(skips)]
    inv_z_scalars = [0] + [pow(z, p - 2, p) for z in z_scalars[1:]]
    inv_z = _tile_periodic(spec, inv_z_scalars, precision)
    for q, what in ((q1, "D1"), (q2, "D2"), (q3, "D3")):
        _check_zero_at_stride(spec, q, skips, what)
    d1 = kernels.mmul_ev(spec, q1, inv_z)
    d2 = kernels.mmul_ev(spec, q2, inv_z)
    d3 = kernels.mmul_ev(spec, q3, inv_z)

    # --- boundary interpolants and quotients (utils.rs:421-524) ---
    pub_xs = [pow(params.g2, skips * w, p) for (_, w) in arith.public_first_indices]
    pub_ys = [public_wires[k] for (k, _) in arith.public_first_indices]
    interpolant2 = ph.lagrange_interp(spec, pub_xs, pub_ys)
    i2_ev = kernels.horner_eval(spec, mm.mont_consts(spec, interpolant2), xs_full)
    # I3 interpolates {(g1^-1, 1)} => the constant poly 1 (utils.rs:458-463)
    one_big = jnp.broadcast_to(mm.mont_one(spec), s_ev.shape)

    zb2 = kernels.vanishing_eval(spec, xs_full, mm.mont_consts(spec, pub_xs))
    x_last = pow(params.g2, precision - skips, p)
    zb3 = mm.msub(spec, xs_full, jnp.broadcast_to(mm.mont_const(spec, x_last), xs_full.shape))
    b2 = kernels.mmul_ev(spec, mm.msub(spec, s_ev, i2_ev), mm.multi_inv(spec, zb2))
    b3 = kernels.mmul_ev(spec, mm.msub(spec, a_ev, one_big), mm.multi_inv(spec, zb3))

    # --- m-tree: 256-byte leaves P||A||S||D1||D2||D3||B2||B3 (prove.rs:235) ---
    with phase("m_tree"):
        from stark_tpu.protocol.core import _words_best

        cols = [p_ev, a_ev, s_ev, d1, d2, d3, b2, b3]
        m_tree = mt.commit_words(_words_best(spec, cols), 256)
        m_root = m_tree.root

    # --- random linear combination L (prove.rs:274-322) ---
    k_coeffs = [1] + [
        ts.seed_to_field(spec, [m_root, bytes([i])]) for i in range(1, 11)
    ]
    pow_scalars = [pow(omega, t, p) for t in range(skips)]  # x^steps, period 8
    x_to_steps = _tile_periodic(spec, pow_scalars, precision)
    l_ev = kernels.linear_combination(
        spec, mm.mont_consts(spec, k_coeffs), x_to_steps,
        p_ev, a_ev, s_ev, d1, d2, d3, b2, b3,
    )

    with phase("l_tree"):
        from stark_tpu.protocol.core import _words_best

        l_tree = mt.commit_words(_words_best(spec, [l_ev]), 32)
        l_root = l_tree.root

    # --- spot checks (prove.rs:337-362) ---
    positions = ts.get_pseudorandom_indices(
        l_root, precision, SPOT_CHECK_SECURITY_FACTOR, skips
    )
    with phase("branches"):
        linear_comb_branches = l_tree.gen_proofs(positions)
        main_branches = m_tree.gen_proofs(augmented_positions(positions, params))

    # --- FRI (prove.rs:367) ---
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
