"""Pallas TPU kernels for the hot field ops: Montgomery multiply and the
radix-2 NTT butterfly stage.

Why Pallas here: the XLA limb kernels in :mod:`stark_tpu.ops.modmath` express
the 16-limb schoolbook/REDC as `fori_loop`s whose accumulators round-trip
through HBM, and the butterfly's (m, 2, l) views force tiled-layout churn.
These kernels instead keep one (L, T) tile of operands resident in VMEM and
run the whole multiply + reduction + carry chain unrolled on the VPU --
one HBM read and one write per operand per stage, which is the memory-bound
speed of light for an NTT stage.

Replaces the compute path of the reference's `serial_fft`/`parallel_fft`
butterfly loops (`/root/reference/packages/fri/src/fft.rs:150-251`) and the
`ff_derive` Montgomery multiply (`packages/ff_utils/src/fp.rs:8-12`).

Layout contract (same as modmath): uint32 planes, 16-bit limbs, limbs-first
`(L, n)`, values in Montgomery form. Kernels run in interpret mode on CPU
(tests, the driver's virtual-mesh dryrun) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.fields.field import LIMB_BITS, FieldSpec, int_to_limbs

MASK = np.uint32((1 << LIMB_BITS) - 1)
SHIFT = LIMB_BITS
TILE = 1024  # lanes per kernel block


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows(x):
    """(L, T) value -> list of L (T,) row vectors."""
    return [x[i] for i in range(x.shape[0])]


def _carry(cols, keep: int):
    """Ripple-carry deferred columns (< 2^31) to exact 16-bit limbs."""
    out = []
    c = None
    for k in range(keep):
        v = cols[k] if c is None else cols[k] + c
        out.append(v & MASK)
        c = v >> SHIFT
    return out, c


def _bigmul_cols_loop(A, B, L: int):
    """(L, T) x (L, T) -> (2L+1, T) deferred columns (< 2^21 each).

    Static python loop over A's limbs, one whole-plane (L, T) multiply per
    iteration (full-sublane vector ops; Mosaic has no dynamic_slice on
    values, and per-scalar-row unrolling is 16x more instructions)."""
    T = A.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    cols = jnp.zeros((2 * L + 1, T), jnp.uint32)
    for i in range(L):
        pp = A[i][None, :] * B  # (L, T) exact 16x16 products
        contrib = jnp.concatenate([pp & MASK, zrow], axis=0) + jnp.concatenate(
            [zrow, pp >> SHIFT], axis=0
        )  # (L+1, T)
        # place contrib at row offset i: i zero rows above, L-i below
        pads = [zrow] * i + [contrib] + [zrow] * (L - i)  # 2L+1 rows total
        cols = cols + jnp.concatenate(pads, axis=0)
    return cols


def _carry_arr(cols, keep: int):
    """Array variant of `_carry`: (K, T) deferred columns -> list of rows."""
    return _carry([cols[k] for k in range(cols.shape[0])], keep)


def _mont_mul_rows(spec: FieldSpec, A, B):
    """Montgomery product of row lists (length L each, canonical 16-bit
    limbs). Returns L rows = (a*b*R^-1) mod p. The three schoolbook products
    run as fori_loops (small compiled body; accumulators live in VMEM);
    carries and the conditional subtract are short static chains."""
    L = spec.num_limbs
    P = spec.p_limbs
    NP = int_to_limbs(
        (-pow(spec.p, -1, 1 << spec.r_bits)) % (1 << spec.r_bits), L
    )
    Aa = jnp.stack(A, axis=0)
    Ba = jnp.stack(B, axis=0)
    T = Aa.shape[1]

    def const_plane(limbs):
        # built from scalars in-trace: pallas kernels may not capture
        # concrete array constants
        return jnp.stack(
            [jnp.full((T,), np.uint32(c), jnp.uint32) for c in limbs], axis=0
        )

    # t = a*b
    t, _ = _carry_arr(_bigmul_cols_loop(Aa, Ba, L), 2 * L + 1)
    # m = (t mod R) * n' mod R (low L columns only; extra highs are dropped)
    mcols = _bigmul_cols_loop(jnp.stack(t[:L], axis=0), const_plane(NP), L)
    m, _ = _carry_arr(mcols[:L], L)
    # s = (t + m*p) / R  (< 2p, fits L limbs)
    ucols = _bigmul_cols_loop(jnp.stack(m, axis=0), const_plane(P), L)
    ucols = ucols + jnp.stack(t, axis=0)
    s, _ = _carry_arr(ucols, 2 * L + 1)
    return _cond_sub_p_rows(spec, s[L : 2 * L])


def _cond_sub_p_rows(spec: FieldSpec, limbs):
    """Rows (< 2p) -> canonical: subtract p where >= p (complement add)."""
    L = spec.num_limbs
    P = spec.p_limbs
    diff = []
    c = jnp.ones_like(limbs[0])  # +1 of the two's complement
    for i in range(L):
        v = limbs[i] + np.uint32(MASK - P[i]) + c
        diff.append(v & MASK)
        c = v >> SHIFT
    ge = c > 0  # no borrow -> value >= p
    return [jnp.where(ge, diff[i], limbs[i]) for i in range(L)]


def _add_rows(spec: FieldSpec, A, B):
    L = spec.num_limbs
    out = []
    c = None
    for i in range(L):
        v = A[i] + B[i] if c is None else A[i] + B[i] + c
        out.append(v & MASK)
        c = v >> SHIFT
    # value < 2p fits L limbs for our <2^255 moduli; c is 0 here
    return _cond_sub_p_rows(spec, out)


def _sub_rows(spec: FieldSpec, A, B):
    """(a - b) mod p: a + (R-1-b) + 1; add p back on borrow."""
    L = spec.num_limbs
    P = spec.p_limbs
    raw = []
    c = jnp.ones_like(A[0])
    for i in range(L):
        v = A[i] + (MASK - B[i]) + c
        raw.append(v & MASK)
        c = v >> SHIFT
    a_ge_b = c > 0
    fixed = []
    c2 = None
    for i in range(L):
        v = raw[i] + np.uint32(P[i]) if c2 is None else raw[i] + np.uint32(P[i]) + c2
        fixed.append(v & MASK)
        c2 = v >> SHIFT
    return [jnp.where(a_ge_b, raw[i], fixed[i]) for i in range(L)]


# ---------------------------------------------------------------------------
# elementwise Montgomery multiply kernel
# ---------------------------------------------------------------------------

def _mmul_kernel(spec, a_ref, b_ref, o_ref):
    A = _rows(a_ref[:])
    B = _rows(b_ref[:])
    out = _mont_mul_rows(spec, A, B)
    o_ref[:] = jnp.stack(out, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def mmul(spec: FieldSpec, a, b):
    """Elementwise Montgomery product of (L, n) planes (n multiple of TILE
    preferred; any n works with one block)."""
    L, n = a.shape
    t = TILE if n % TILE == 0 else n
    grid = (n // t,)
    return pl.pallas_call(
        functools.partial(_mmul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a, b)


# ---------------------------------------------------------------------------
# NTT butterfly stage kernel
# ---------------------------------------------------------------------------
#
# One radix-2 stage over the flat (L, n) array viewed as (L, m, 2, l):
#   y0 = x0 + tw*x1 ; y1 = x0 - tw*x1
# Each kernel block covers g whole group-pairs of width w (g*w = TILE or the
# whole stage if smaller), so every HBM access is a regular strided slice.
# Twiddles: "dif" = per group (tw array (L, m)); "dit" = per in-group
# position (tw array (L, l)).


# ---------------------------------------------------------------------------
# NTT butterfly stages (classic position-twiddle factorizations)
# ---------------------------------------------------------------------------
#
# Stage shape: (L, n) flat array viewed as groups of 2l; within a group,
# position k in [l] pairs (u, v) = (x[k], x[k+l]); the twiddle w^(k*m)
# (m = n/2l) depends only on k -- Gentleman-Sande DIF (natural -> bitrev):
#     y[k] = u + v ;        y[k+l] = (u - v) * tw_k
# and Cooley-Tukey DIT (bitrev -> natural):
#     t = v * tw_k ; y[k] = u + t ; y[k+l] = u - t
# Both directions share identical per-stage twiddle tables (L, l).
#
# For l >= TILE the pairs are DMA'd as two lane-wide chunks of a strided
# 4-D block. For l < TILE ("fused" stages) whole groups sit inside one
# (L, block) tile; partners are reached with the XOR-roll trick
# (pair[i] = x[i^l] = select(bit_l(i), roll(x,l), roll(x,-l))), which needs
# no lane-splitting reshapes, and all remaining stages run back-to-back in
# VMEM with one HBM round trip. Their twiddle rows are precomputed
# full-width (L, block) patterns (period 2l: [tw_0..tw_{l-1}] twice) --
# identical for every block, a few MB total.


def _butterfly_pair(spec, kind, X0, X1, TW):
    """Row lists (u, v, tw) -> (y0, y1) rows per the formulas above."""
    if kind == "dif":
        y0 = _add_rows(spec, X0, X1)
        y1 = _mont_mul_rows(spec, TW, _sub_rows(spec, X0, X1))
    else:
        t = _mont_mul_rows(spec, TW, X1)
        y0 = _add_rows(spec, X0, t)
        y1 = _sub_rows(spec, X0, t)
    return y0, y1


# ---------------------------------------------------------------------------
# Shoup (precomputed-quotient) twiddle multiplication
# ---------------------------------------------------------------------------
#
# For a CONSTANT multiplier w with companion w' = floor(w*R/p) (R = 2^256):
#   q = floor_approx(w'*x / R)   (high product columns only; error <= 1)
#   r = (w*x - q*p) mod R        (low product columns only) in [0, 3p)
# ~1.7 full 16x16-limb products instead of Montgomery's 3. Values flow
# LAZILY in [0, 2p); the final stage canonicalizes with one extra
# conditional subtract. Twiddles are PLAIN (non-Montgomery): w * (xR) =
# (wx)R keeps Montgomery data in Montgomery form.


def _mul_cols_range(A_rows, B_rows, lo_col: int, hi_col: int):
    """Deferred columns lo_col..hi_col of the 2L-limb product of two
    16-bit-canonical row lists; only the needed 16x16 products are formed."""
    Lr = len(A_rows)
    prods = {}

    def pp(i, j):
        if (i, j) not in prods:
            v = A_rows[i] * B_rows[j]
            prods[(i, j)] = (v & MASK, v >> SHIFT)
        return prods[(i, j)]

    cols = []
    for k in range(lo_col, hi_col + 1):
        terms = []
        for i in range(Lr):
            j = k - i
            if 0 <= j < Lr:
                terms.append(pp(i, j)[0])
            j2 = k - 1 - i
            if 0 <= j2 < Lr:
                terms.append(pp(i, j2)[1])
        if not terms:
            cols.append(jnp.zeros_like(A_rows[0]))
            continue
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        cols.append(acc)
    return cols


def _carry_list(cols):
    out, c = [], None
    for v in cols:
        v = v if c is None else v + c
        out.append(v & MASK)
        c = v >> SHIFT
    return out


def _cond_sub_rows(rows, mod_limbs):
    """rows - mod if rows >= mod (16-bit limb rows, two's complement)."""
    Lr = len(rows)
    diff = []
    c = jnp.ones_like(rows[0])
    for i in range(Lr):
        v = rows[i] + np.uint32(MASK - mod_limbs[i]) + c
        diff.append(v & MASK)
        c = v >> SHIFT
    ge = c > 0
    return [jnp.where(ge, diff[i], rows[i]) for i in range(Lr)]


def _mul_cols_range_planes(A, B, lo_col: int, hi_col: int):
    """Deferred columns lo_col..hi_col of the 2L-limb product of (L, T)
    planes A, B — the plane-parallel twin of `_mul_cols_range`: one sliced
    whole-plane multiply per A-limb (full-sublane vector ops) forming only
    the (i, j) pairs that can land in the range. Returns an
    (hi_col-lo_col+1, T) array; contributions beyond hi_col are dropped
    (mod-R truncation, same as the row version)."""
    L, T = A.shape
    ncols = hi_col - lo_col + 1
    zrow = jnp.zeros((1, T), jnp.uint32)
    acc = jnp.zeros((ncols + 1, T), jnp.uint32)  # +1 transient spill row
    for i in range(L):
        # lo parts land at column i+j, hi parts at i+j+1: j in
        # [lo_col-1-i, hi_col-i] can contribute
        j0 = max(0, lo_col - 1 - i)
        j1 = min(L - 1, hi_col - i)
        if j0 > j1:
            continue
        pp = A[i][None, :] * jax.lax.slice_in_dim(B, j0, j1 + 1, axis=0)
        contrib = jnp.concatenate([pp & MASK, zrow], axis=0) + jnp.concatenate(
            [zrow, pp >> SHIFT], axis=0
        )  # rows for columns i+j0 .. i+j1+1
        start = i + j0 - lo_col  # may be -1 (lo part just below range)
        crop = max(0, -start)
        end = min(start + contrib.shape[0], ncols + 1)  # exclusive
        contrib = contrib[crop : crop + (end - max(start, 0))]
        pads = []
        if max(start, 0) > 0:
            pads.append(jnp.zeros((max(start, 0), T), jnp.uint32))
        pads.append(contrib)
        tail = (ncols + 1) - max(start, 0) - contrib.shape[0]
        if tail > 0:
            pads.append(jnp.zeros((tail, T), jnp.uint32))
        acc = acc + jnp.concatenate(pads, axis=0)
    return acc[:ncols]


def _shoup_mul_rows(spec: FieldSpec, W, Wp, X):
    """W, Wp: constant-twiddle row lists (plain w and floor(w*R/p)); X:
    data rows in [0, 2p). Returns rows of (w*x mod p) in [0, 2p).

    ~1.6 full-plane limb products (partial ranges only) vs Montgomery's 3;
    products run as whole-plane ops (`_mul_cols_range_planes`) — the
    per-(i, j) row version packs (T,) vectors at 1/8 sublane occupancy on
    the VPU and measured ~2x slower in the fused protocol kernels."""
    Lr = spec.num_limbs
    Wpa = jnp.stack(Wp, axis=0)
    Wa = jnp.stack(W, axis=0)
    Xa = jnp.stack(X, axis=0)
    qcols = _mul_cols_range_planes(Wpa, Xa, Lr - 2, 2 * Lr)
    q, _ = _carry_arr(qcols, qcols.shape[0])
    qhat = jnp.stack(q[2 : 2 + Lr], axis=0)
    wx, _ = _carry_arr(_mul_cols_range_planes(Wa, Xa, 0, Lr - 1), Lr)
    pconst = jnp.stack(
        [
            jnp.full(X[0].shape, np.uint32(c), jnp.uint32)
            for c in spec.p_limbs
        ],
        axis=0,
    )
    qp, _ = _carry_arr(_mul_cols_range_planes(qhat, pconst, 0, Lr - 1), Lr)
    r = []
    c = jnp.ones_like(wx[0])
    for i in range(Lr):
        v = wx[i] + (MASK - qp[i]) + c
        r.append(v & MASK)
        c = v >> SHIFT
    return _cond_sub_rows(r, _two_p_limbs(spec))


def _two_p_limbs(spec: FieldSpec):
    twop = 2 * spec.p
    return [(twop >> (SHIFT * i)) & int(MASK) for i in range(spec.num_limbs)]


def _add_rows_lazy(spec: FieldSpec, A, B):
    """[0,2p) + [0,2p) -> [0,2p) via one conditional subtract of 2p."""
    out, c = [], None
    for i in range(len(A)):
        v = A[i] + B[i] if c is None else A[i] + B[i] + c
        out.append(v & MASK)
        c = v >> SHIFT
    return _cond_sub_rows(out, _two_p_limbs(spec))


def _sub_rows_lazy(spec: FieldSpec, A, B):
    """(a - b) + 2p with one conditional subtract of 2p: [0,2p) in/out.

    Computed as a + (2p + ~b + 1) limb-wise: the deferred column
    2p_i + (MASK - b_i) stays < 2^18, exact in u32 with the carry chain."""
    twop = _two_p_limbs(spec)
    out = []
    c = jnp.ones_like(A[0])
    for i in range(len(A)):
        nb = np.uint32(twop[i] + int(MASK)) - B[i]  # 2p_i + (MASK - b_i)
        v = A[i] + nb + c
        out.append(v & MASK)
        c = v >> SHIFT
    return _cond_sub_rows(out, twop)


def _butterfly_pair_shoup(spec, kind, X0, X1, TW, TWP, canon: bool):
    """Lazy-[0,2p) butterfly with a Shoup twiddle multiply; canon
    canonicalizes the outputs to [0,p) (final stage)."""
    if kind == "dif":
        y0 = _add_rows_lazy(spec, X0, X1)
        y1 = _cond_sub_rows(
            _shoup_mul_rows(spec, TW, TWP, _sub_rows_lazy(spec, X0, X1)),
            _two_p_limbs(spec),
        )
    else:
        t = _shoup_mul_rows(spec, TW, TWP, X1)
        t = _cond_sub_rows(t, _two_p_limbs(spec))
        y0 = _add_rows_lazy(spec, X0, t)
        y1 = _sub_rows_lazy(spec, X0, t)
    if canon:
        y0 = _cond_sub_p_rows(spec, y0)
        y1 = _cond_sub_p_rows(spec, y1)
    return y0, y1


def _single_stage_kernel(spec, kind, shoup, canon, x_ref, tw_ref, o_ref):
    # block (L, 1, 2, w): one group-pair chunk; tw block (L or 2L, w)
    L = spec.num_limbs
    x0 = x_ref[:, 0, 0, :]
    x1 = x_ref[:, 0, 1, :]
    tw = tw_ref[:]
    if shoup:
        y0, y1 = _butterfly_pair_shoup(
            spec, kind, _rows(x0), _rows(x1),
            [tw[i] for i in range(L)], [tw[L + i] for i in range(L)], canon,
        )
    else:
        y0, y1 = _butterfly_pair(
            spec, kind, _rows(x0), _rows(x1), _rows(tw)
        )
    o_ref[:, 0, 0, :] = jnp.stack(y0, axis=0)
    o_ref[:, 0, 1, :] = jnp.stack(y1, axis=0)


def butterfly_stage(
    spec: FieldSpec, a, tw_stage, m: int, l: int, kind: str,
    shoup: bool = False, canon: bool = False,
):
    """One radix-2 stage on flat (L, n) `a` viewed as (L, m, 2, l); only for
    l >= TILE. tw_stage: (L, l) Montgomery table, or (2L, l) stacked
    [plain ; shoup-companion] rows when `shoup`."""
    L, n = a.shape
    assert n == 2 * m * l and l % TILE == 0
    tl = tw_stage.shape[0]
    w = TILE
    grid = (m, l // w)
    a4 = a.reshape(L, m, 2, l)
    out = pl.pallas_call(
        functools.partial(_single_stage_kernel, spec, kind, shoup, canon),
        out_shape=jax.ShapeDtypeStruct((L, m, 2, l), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (L, 1, 2, w), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tl, w), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, 1, 2, w), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(a4, tw_stage)
    return out.reshape(L, n)


def _roll(x, shift):
    if _interpret():
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _fused_kernel(spec, ls, block, kind, shoup, canon, x_ref, tw_ref, o_ref):
    """All stages with 2*l <= block in VMEM; tw_ref: (L or 2L, n_stages,
    block). With `canon`, the LAST stage canonicalizes to [0, p)."""
    L = spec.num_limbs
    x = x_ref[:]  # (L, block)
    ids = jax.lax.broadcasted_iota(jnp.uint32, (L, block), 1)
    for s, l in enumerate(ls):
        bit = (ids & np.uint32(l)) != 0
        pair = jnp.where(bit, _roll(x, l), _roll(x, -l))
        u = jnp.where(bit, pair, x)
        v = jnp.where(bit, x, pair)
        tw = tw_ref[:, s, :]
        if shoup:
            y0, y1 = _butterfly_pair_shoup(
                spec, kind, _rows(u), _rows(v),
                [tw[i] for i in range(L)], [tw[L + i] for i in range(L)],
                canon and s == len(ls) - 1,
            )
        else:
            y0, y1 = _butterfly_pair(spec, kind, _rows(u), _rows(v), _rows(tw))
        y0 = jnp.stack(y0, axis=0)
        y1 = jnp.stack(y1, axis=0)
        x = jnp.where(bit, y1, y0)
    o_ref[:] = x


def make_fused_rows(spec: FieldSpec, stage_ls, stage_tws, block: int):
    """Per-stage (L, l) tables -> (L, n_stages, block) full-width rows with
    period-2l pattern [tw_0..tw_{l-1}, tw_0..tw_{l-1}]."""
    rows = []
    for l, tw in zip(stage_ls, stage_tws):
        rows.append(jnp.tile(tw, (1, block // l))[:, None, :])
    return jnp.concatenate(rows, axis=1)


def butterfly_fused(
    spec: FieldSpec, a, tw_rows, stage_ls, block: int, kind: str,
    shoup: bool = False, canon: bool = False,
):
    """Run the small-l stage run in one kernel. a: flat (L, n)."""
    L, n = a.shape
    tl = tw_rows.shape[0]
    return pl.pallas_call(
        functools.partial(_fused_kernel, spec, stage_ls, block, kind, shoup, canon),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tl, len(stage_ls), block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a, tw_rows)


# ---------------------------------------------------------------------------
# scalar-lane Montgomery exponentiation (Fermat inversion, transcript pows)
# ---------------------------------------------------------------------------
#
# XLA lowers `mpow`'s square-and-multiply fori_loop to a device `while`
# whose per-iteration overhead on a (L, 1) scalar is ~0.15 ms -- the
# single Fermat inversion inside the permutation accumulator measured
# 76 ms of device time per prove (the top kernel of the first real
# device profile). Here the whole chain runs in one kernel: the operand
# stays in VMEM/registers and the exponent bits ride in SMEM.


def _mpow_kernel(spec, nbits, bits_ref, a_ref, o_ref):
    L = spec.num_limbs
    a_rows = _rows(a_ref[:])
    one_rows = tuple(
        jnp.full(a_ref.shape[1:], np.uint32(w), jnp.uint32)
        for w in int_to_limbs(spec.r_mod_p, L)
    )

    def body(i, run):
        run = _mont_mul_rows(spec, list(run), list(run))
        mul = _mont_mul_rows(spec, run, a_rows)
        b = bits_ref[i]
        return tuple(
            jnp.where(b > 0, m, r) for m, r in zip(mul, run)
        )

    out = jax.lax.fori_loop(0, nbits, body, one_rows)
    o_ref[:] = jnp.stack(list(out), axis=0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mpow_scalar(spec: FieldSpec, a, e: int):
    """a^e for a small (L, k) Montgomery array (k <= a few lanes), one
    fused kernel. MSB-first square-and-multiply; the static exponent's
    bits travel as an SMEM operand so the loop body is traced once."""
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.int32
    )
    L, k = a.shape
    return pl.pallas_call(
        functools.partial(_mpow_kernel, spec, nbits),
        out_shape=jax.ShapeDtypeStruct((L, k), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(bits, a)


# ---------------------------------------------------------------------------
# sequential prefix-product scan (for batch inversion / grand products)
# ---------------------------------------------------------------------------
#
# (L, B, C): C independent chunks on the lane axis, scanned sequentially
# along axis 1. The running product lives in a VMEM scratch that persists
# across the (sequential) grid steps, so the whole scan is one kernel with
# one HBM pass -- the XLA lax.scan equivalent pays an HBM round trip per
# element (~1 ms x 1024 steps at 2^20).

_SCAN_KB = 8  # rows per grid step (static unroll inside the kernel)


def _scan_kernel(spec, kb, x_ref, o_ref, run_ref):
    L = spec.num_limbs

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Montgomery one = R mod p, built from scalars in-trace
        r1 = int_to_limbs(spec.r_mod_p, L)
        run_ref[:] = jnp.stack(
            [jnp.full(run_ref.shape[1:], np.uint32(c), jnp.uint32) for c in r1],
            axis=0,
        )

    run = _rows(run_ref[:])
    for k in range(kb):
        run = _mont_mul_rows(spec, run, _rows(x_ref[:, k, :]))
        o_ref[:, k, :] = jnp.stack(run, axis=0)
    run_ref[:] = jnp.stack(run, axis=0)


def scan_prod(spec: FieldSpec, x):
    """Inclusive prefix product along axis 1 of (L, B, C) Montgomery limbs
    (independent per lane-column c)."""
    L, B, C = x.shape
    kb = _SCAN_KB if B % _SCAN_KB == 0 else B
    return pl.pallas_call(
        functools.partial(_scan_kernel, spec, kb),
        out_shape=jax.ShapeDtypeStruct((L, B, C), jnp.uint32),
        grid=(B // kb,),
        in_specs=[
            pl.BlockSpec((L, kb, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((L, kb, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, C), jnp.uint32)],
        interpret=_interpret(),
    )(x)
