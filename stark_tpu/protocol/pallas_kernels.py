"""Fused Pallas versions of the prover's element-wise protocol kernels.

Each constraint/quotient/boundary evaluation in
:mod:`stark_tpu.protocol.kernels` is a handful of modular ops over the whole
(L, precision) domain. Composed from the XLA limb ops they cost one HBM
round trip *per op* (~25 ms each at 2^20); fused here, each stage reads its
operands once, runs the whole Montgomery chain in VMEM, and writes once.

Reference parity: these compute exactly `utils.rs:181-376` (Q1/Q2/Q3,
randomized combinations), `prove.rs:293-322` (the linear combination L),
`utils.rs:421-474` (boundary interpolant/vanishing evaluations), and the
leaf packing of `prove.rs:235-258`. The jnp implementations in kernels.py
remain the CPU / small-size path; `kernels.py` dispatches per call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.fields.field import FieldSpec, int_to_limbs
from stark_tpu.ops import pallas_field as pf

TILE = pf.TILE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mul(spec, a, b):
    return pf._mont_mul_rows(spec, a, b)


def _spec_cols(L, n, t):
    return pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM)


def _call(spec, kernel, n_out, inputs, small=()):
    """Launch `kernel` over (L, n) tiled inputs plus small full-array
    operands (scalars tables like r/k coefficient columns)."""
    L = spec.num_limbs
    n = inputs[0].shape[1]
    # a mismatched operand width would make the tiled BlockSpecs read out
    # of bounds -- observed to CRASH the remote TPU worker outright, so
    # fail at trace time instead
    for x in inputs:
        assert x.shape[1] == n, (
            f"pallas kernel operands must share the domain width: "
            f"{[tuple(i.shape) for i in inputs]}"
        )
    t = TILE if n % TILE == 0 else n
    in_specs = [
        pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in small
    ] + [_spec_cols(L, n, t) for _ in inputs]
    out_shape = [jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(n_out)]
    out_specs = [_spec_cols(L, n, t) for _ in range(n_out)]
    if n_out == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n // t,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_interpret(),
    )(*small, *inputs)


def _bc_col(col_ref, j, shape):
    """(L, K) small ref -> column j broadcast to (L, T) row list."""
    col = jnp.broadcast_to(col_ref[:, j : j + 1], shape)
    return pf._rows(col)


# --- rand_combination: nmr/dnm = r0 + r1*v + r2*s (utils.rs:317-318) -------

def _rand_comb_kernel(spec, r_ref, idx_ref, perm_ref, s_ref, nmr_ref, dnm_ref):
    shape = idx_ref.shape
    r0 = _bc_col(r_ref, 0, shape)
    r1 = _bc_col(r_ref, 1, shape)
    r2 = _bc_col(r_ref, 2, shape)
    s = pf._rows(s_ref[:])
    r2s = _mul(spec, r2, s)
    nmr = pf._add_rows(spec, r0, pf._add_rows(spec, _mul(spec, r1, pf._rows(idx_ref[:])), r2s))
    dnm = pf._add_rows(spec, r0, pf._add_rows(spec, _mul(spec, r1, pf._rows(perm_ref[:])), r2s))
    nmr_ref[:] = jnp.stack(nmr, axis=0)
    dnm_ref[:] = jnp.stack(dnm, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def rand_combination(spec: FieldSpec, r_mont, idx_ev, perm_ev, s_ev):
    return _call(
        spec,
        functools.partial(_rand_comb_kernel, spec),
        2,
        [idx_ev, perm_ev, s_ev],
        small=(r_mont,),
    )


# --- Q1 = F0*(P - F1*P_prev - K*S) (utils.rs:181-213) ----------------------

def _q1_kernel(spec, f0_ref, p_ref, pp_ref, f1_ref, k_ref, s_ref, o_ref):
    t = _mul(spec, pf._rows(f1_ref[:]), pf._rows(pp_ref[:]))
    u = _mul(spec, pf._rows(k_ref[:]), pf._rows(s_ref[:]))
    v = pf._sub_rows(spec, pf._rows(p_ref[:]), pf._add_rows(spec, t, u))
    o_ref[:] = jnp.stack(_mul(spec, pf._rows(f0_ref[:]), v), axis=0)


@functools.partial(jax.jit, static_argnums=(0, 6))
def q1_eval(spec: FieldSpec, s_ev, k_ev, p_ev, f0_ev, f1_ev, skips: int):
    p_prev = jnp.roll(p_ev, skips, axis=1)
    return _call(
        spec,
        functools.partial(_q1_kernel, spec),
        1,
        [f0_ev, p_ev, p_prev, f1_ev, k_ev, s_ev],
    )


# --- Q2 = F2*(P(+2k) - P*P(+k)) (utils.rs:217-248) -------------------------

def _q2_kernel(spec, f2_ref, p_ref, pk_ref, p2k_ref, o_ref):
    prod = _mul(spec, pf._rows(p_ref[:]), pf._rows(pk_ref[:]))
    diff = pf._sub_rows(spec, pf._rows(p2k_ref[:]), prod)
    o_ref[:] = jnp.stack(_mul(spec, pf._rows(f2_ref[:]), diff), axis=0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def q2_eval(spec: FieldSpec, p_ev, f2_ev, kshift: int):
    p_k = jnp.roll(p_ev, -kshift, axis=1)
    p_2k = jnp.roll(p_ev, -2 * kshift, axis=1)
    return _call(
        spec, functools.partial(_q2_kernel, spec), 1, [f2_ev, p_ev, p_k, p_2k]
    )


# --- Q3 = A*dnm - A_prev*nmr (utils.rs:344-376) ----------------------------

def _q3_kernel(spec, a_ref, ap_ref, nmr_ref, dnm_ref, o_ref):
    x = _mul(spec, pf._rows(a_ref[:]), pf._rows(dnm_ref[:]))
    y = _mul(spec, pf._rows(ap_ref[:]), pf._rows(nmr_ref[:]))
    o_ref[:] = jnp.stack(pf._sub_rows(spec, x, y), axis=0)


@functools.partial(jax.jit, static_argnums=(0, 4))
def q3_eval(spec: FieldSpec, a_ev, val_nmr_big, val_dnm_big, skips: int):
    a_prev = jnp.roll(a_ev, skips, axis=1)
    return _call(
        spec,
        functools.partial(_q3_kernel, spec),
        1,
        [a_ev, a_prev, val_nmr_big, val_dnm_big],
    )


# --- linear combination (prove.rs:293-322) ---------------------------------

def _lincomb_kernel(
    spec, k_ref, x_ref, p_ref, a_ref, s_ref, d1_ref, d2_ref, d3_ref,
    b2_ref, b3_ref, o_ref,
):
    shape = p_ref.shape
    x2s = pf._rows(x_ref[:])
    cols = {
        "p": pf._rows(p_ref[:]), "a": pf._rows(a_ref[:]), "s": pf._rows(s_ref[:]),
        "d1": pf._rows(d1_ref[:]), "d2": pf._rows(d2_ref[:]), "d3": pf._rows(d3_ref[:]),
        "b2": pf._rows(b2_ref[:]), "b3": pf._rows(b3_ref[:]),
    }
    km = [_bc_col(k_ref, i, shape) for i in range(11)]
    acc = _mul(spec, km[0], cols["d1"])
    for j, term in (
        (1, cols["d2"]), (2, cols["d3"]), (3, cols["p"]),
        (4, _mul(spec, cols["p"], x2s)), (5, cols["b2"]),
        (6, _mul(spec, cols["b2"], x2s)), (7, cols["b3"]),
        (8, _mul(spec, cols["b3"], x2s)), (9, cols["a"]), (10, cols["s"]),
    ):
        acc = pf._add_rows(spec, acc, _mul(spec, km[j], term))
    o_ref[:] = jnp.stack(acc, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def linear_combination(
    spec: FieldSpec, k_mont, x_to_steps, p_ev, a_ev, s_ev, d1, d2, d3, b2, b3
):
    return _call(
        spec,
        functools.partial(_lincomb_kernel, spec),
        1,
        [x_to_steps, p_ev, a_ev, s_ev, d1, d2, d3, b2, b3],
        small=(k_mont,),
    )


# --- boundary helpers (utils.rs:421-524) -----------------------------------

def _horner_kernel(spec, deg1, c_ref, xs_ref, o_ref):
    shape = xs_ref.shape
    xs = pf._rows(xs_ref[:])
    out = _bc_col(c_ref, deg1 - 1, shape)
    for i in range(deg1 - 2, -1, -1):
        out = pf._add_rows(spec, _mul(spec, out, xs), _bc_col(c_ref, i, shape))
    o_ref[:] = jnp.stack(out, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def horner_eval(spec: FieldSpec, coeffs_mont, xs_full):
    deg1 = coeffs_mont.shape[1]
    return _call(
        spec,
        functools.partial(_horner_kernel, spec, deg1),
        1,
        [xs_full],
        small=(coeffs_mont,),
    )


def _vanish_kernel(spec, npts, pts_ref, xs_ref, o_ref):
    shape = xs_ref.shape
    xs = pf._rows(xs_ref[:])
    # Montgomery one (= R mod p) rides as the extra last column of pts_ref
    acc = _bc_col(pts_ref, npts, shape)
    for i in range(npts):
        acc = _mul(spec, acc, pf._sub_rows(spec, xs, _bc_col(pts_ref, i, shape)))
    o_ref[:] = jnp.stack(acc, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def vanishing_eval(spec: FieldSpec, xs_full, points_mont):
    from stark_tpu.ops import modmath as mm

    npts = points_mont.shape[1]
    pts_plus_one = jnp.concatenate([points_mont, mm.mont_one(spec)], axis=1)
    return _call(
        spec,
        functools.partial(_vanish_kernel, spec, npts),
        1,
        [xs_full],
        small=(pts_plus_one,),
    )


# --- Shoup (precomputed-quotient) periodic-constant multiply ---------------
#
# Z(x)^-1 and x^steps are periodic with period EXTENSION_FACTOR on the
# evaluation domain (prove.rs:128-129,287-291). The Shoup form multiplies a
# Montgomery-domain array by PLAIN per-position constants in ~1.7 full
# limb products instead of Montgomery's 3, and the constants travel as ONE
# TILE-wide pattern block reused by every grid step -- no (L, N) table in
# HBM at all. Patterns from `modmath.shoup_consts(scalars * (TILE//k))`.


def _shoup_periodic_kernel(spec, w_ref, wp_ref, x_ref, o_ref):
    out = pf._shoup_mul_rows(
        spec, pf._rows(w_ref[:]), pf._rows(wp_ref[:]), pf._rows(x_ref[:])
    )
    o_ref[:] = jnp.stack(pf._cond_sub_p_rows(spec, out), axis=0)


@functools.partial(jax.jit, static_argnums=0)
def shoup_mul_periodic(spec: FieldSpec, w_pat, wp_pat, x):
    """x * periodic plain constants, canonical output. w_pat/wp_pat:
    (L, TILE) period-tiled pattern blocks (identical for every block)."""
    L, n = x.shape
    t = w_pat.shape[1]
    assert n % t == 0, (n, t)
    return pl.pallas_call(
        functools.partial(_shoup_periodic_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((L, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(w_pat, wp_pat, x)


# --- linear combination with Shoup x^steps patterns ------------------------


def _lincomb_shoup_kernel(
    spec, k_ref, xw_ref, xwp_ref, p_ref, a_ref, s_ref, d1_ref, d2_ref,
    d3_ref, b2_ref, b3_ref, o_ref,
):
    shape = p_ref.shape
    xw = pf._rows(xw_ref[:])
    xwp = pf._rows(xwp_ref[:])
    # lazy [0, 2p) product is safe: it feeds the Montgomery k_j-multiply,
    # whose REDC tolerates <2p inputs and canonicalizes the output
    mulx = lambda c: pf._shoup_mul_rows(spec, xw, xwp, c)
    cols = {
        "p": pf._rows(p_ref[:]), "a": pf._rows(a_ref[:]), "s": pf._rows(s_ref[:]),
        "d1": pf._rows(d1_ref[:]), "d2": pf._rows(d2_ref[:]), "d3": pf._rows(d3_ref[:]),
        "b2": pf._rows(b2_ref[:]), "b3": pf._rows(b3_ref[:]),
    }
    km = [_bc_col(k_ref, i, shape) for i in range(11)]
    acc = _mul(spec, km[0], cols["d1"])
    for j, term in (
        (1, cols["d2"]), (2, cols["d3"]), (3, cols["p"]),
        (4, mulx(cols["p"])), (5, cols["b2"]),
        (6, mulx(cols["b2"])), (7, cols["b3"]),
        (8, mulx(cols["b3"])), (9, cols["a"]), (10, cols["s"]),
    ):
        acc = pf._add_rows(spec, acc, _mul(spec, km[j], term))
    o_ref[:] = jnp.stack(acc, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def linear_combination_shoup(
    spec: FieldSpec, k_mont, xw_pat, xwp_pat, p_ev, a_ev, s_ev, d1, d2, d3,
    b2, b3,
):
    """`linear_combination` with x^steps as TILE-wide Shoup patterns
    (prove.rs:293-322; same field values, ~1.7 vs 3 limb products per
    x^steps multiply and no (L, N) x^steps table read)."""
    L = spec.num_limbs
    n = p_ev.shape[1]
    t = xw_pat.shape[1]
    assert n % t == 0, (n, t)
    col = lambda: pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    pat = lambda: pl.BlockSpec((L, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lincomb_shoup_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec(k_mont.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pat(), pat(),
        ] + [col() for _ in range(8)],
        out_specs=col(),
        interpret=_interpret(),
    )(k_mont, xw_pat, xwp_pat, p_ev, a_ev, s_ev, d1, d2, d3, b2, b3)


# --- (a - b) * c, and plain elementwise mul --------------------------------

def _submul_kernel(spec, a_ref, b_ref, c_ref, o_ref):
    d = pf._sub_rows(spec, pf._rows(a_ref[:]), pf._rows(b_ref[:]))
    o_ref[:] = jnp.stack(_mul(spec, d, pf._rows(c_ref[:])), axis=0)


@functools.partial(jax.jit, static_argnums=0)
def sub_mul(spec: FieldSpec, a, b, c):
    """(a - b) * c elementwise (the boundary quotients B2/B3)."""
    return _call(spec, functools.partial(_submul_kernel, spec), 1, [a, b, c])


# --- fused from_mont + word packing for Merkle leaves ----------------------

def _pack_kernel(spec, x_ref, o_ref):
    L = spec.num_limbs
    one = [jnp.ones_like(x_ref[0, :])] + [
        jnp.zeros_like(x_ref[0, :]) for _ in range(L - 1)
    ]
    canon = _mul(spec, pf._rows(x_ref[:]), one)  # REDC by 1 = from_mont
    words = [
        canon[2 * w] | (canon[2 * w + 1] << np.uint32(16)) for w in range(L // 2)
    ]
    o_ref[:] = jnp.stack(words, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def from_mont_pack_words(spec: FieldSpec, col):
    """(L, n) Montgomery -> (L/2, n) uint32 LE words of the canonical
    32-byte encodings (the leaf packing of `prove.rs:235-258`)."""
    L = spec.num_limbs
    n = col.shape[1]
    t = TILE if n % TILE == 0 else n
    return pl.pallas_call(
        functools.partial(_pack_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L // 2, n), jnp.uint32),
        grid=(n // t,),
        in_specs=[pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L // 2, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(col)


# --- FRI quartic fold (fri.rs:141-164 / poly_utils.rs:449-511) -------------
#
# Row layout (L, 4, q): row j holds the j-th x-set member for all q rows
# (xs.reshape(L, 4, q) of the flat domain -- x_j[i] = xs[j*q + i]).
# Two kernels around the shared batch inversion: `fri_fold_pre` builds the
# four vanishing cubics eq_j and their denominators e_j = eq_j(x_j);
# `fri_fold_post` combines with y/inverses and evaluates the folded column
# at special_x directly (the interpolated cubic is never materialized).


def _fri_pre_kernel(spec, xs_ref, eq_ref, den_ref):
    x = [pf._rows(xs_ref[:, j, :]) for j in range(4)]
    L = spec.num_limbs
    shape = (L, xs_ref.shape[2])
    zero = pf._rows(jnp.zeros(shape, jnp.uint32))
    neg = lambda a: pf._sub_rows(spec, zero, a)
    xp = {}
    for a, b in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
        xp[(a, b)] = _mul(spec, x[a], x[b])
    others = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    for j, (a, b, c) in enumerate(others):
        xab, xac, xbc = xp[(a, b)], xp[(a, c)], xp[(b, c)]
        c0 = neg(_mul(spec, xab, x[c]))
        c1 = pf._add_rows(spec, pf._add_rows(spec, xab, xac), xbc)
        c2 = neg(pf._add_rows(spec, pf._add_rows(spec, x[a], x[b]), x[c]))
        eq_ref[:, 4 * j + 0, :] = jnp.stack(c0, axis=0)
        eq_ref[:, 4 * j + 1, :] = jnp.stack(c1, axis=0)
        eq_ref[:, 4 * j + 2, :] = jnp.stack(c2, axis=0)
        # c3 = Montgomery one
        one_rows = [
            jnp.full(shape[1:], np.uint32(w), jnp.uint32)
            for w in int_to_limbs(spec.r_mod_p, L)
        ]
        eq_ref[:, 4 * j + 3, :] = jnp.stack(one_rows, axis=0)
        # denominator e_j = eq_j(x_j) with leading coeff 1:
        # ((x + c2)*x + c1)*x + c0
        xj = x[j]
        acc = pf._add_rows(spec, xj, c2)
        acc = pf._add_rows(spec, _mul(spec, acc, xj), c1)
        acc = pf._add_rows(spec, _mul(spec, acc, xj), c0)
        den_ref[:, j, :] = jnp.stack(acc, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def fri_fold_pre(spec: FieldSpec, xs4):
    """xs4: (L, 4, q) -> (eqs (L, 16, q), denoms (L, 4, q))."""
    L, _, q = xs4.shape
    t = TILE if q % TILE == 0 else q
    return pl.pallas_call(
        functools.partial(_fri_pre_kernel, spec),
        out_shape=(
            jax.ShapeDtypeStruct((L, 16, q), jnp.uint32),
            jax.ShapeDtypeStruct((L, 4, q), jnp.uint32),
        ),
        grid=(q // t,),
        in_specs=[
            pl.BlockSpec((L, 4, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((L, 16, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(xs4)


def _fri_post_kernel(spec, sx_ref, eq_ref, ys_ref, inv_ref, o_ref):
    L = spec.num_limbs
    q = ys_ref.shape[2]
    shape = (L, q)
    poly = [None] * 4
    for j in range(4):
        w = _mul(
            spec,
            pf._rows(ys_ref[:, j, :]),
            pf._rows(inv_ref[:, j, :]),
        )
        for k in range(4):
            term = _mul(spec, pf._rows(eq_ref[:, 4 * j + k, :]), w)
            poly[k] = term if poly[k] is None else pf._add_rows(spec, poly[k], term)
    sx = pf._rows(jnp.broadcast_to(sx_ref[:, 0:1], shape))
    # Horner at special_x
    acc = poly[3]
    for k in (2, 1, 0):
        acc = pf._add_rows(spec, _mul(spec, acc, sx), poly[k])
    o_ref[:] = jnp.stack(acc, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def fri_fold_post(spec: FieldSpec, sx, eqs, ys4, invs):
    """Fold to the FRI column: (L,1) special_x, (L,16,q) eqs, (L,4,q) ys,
    (L,4,q) inverted denominators -> (L, q) column values."""
    L, _, q = ys4.shape
    t = TILE if q % TILE == 0 else q
    return pl.pallas_call(
        functools.partial(_fri_post_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, q), jnp.uint32),
        grid=(q // t,),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 16, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(sx, eqs, ys4, invs)
