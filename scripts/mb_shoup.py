"""Microbench: Shoup (precomputed-quotient) constant multiplication kernel
vs the Montgomery multiply, plus a full butterfly stage using it.

shoup_mul(w, w', x) with w' = floor(w*2^256/p):
    q  = floor_approx(w'*x / 2^256)   (high columns only, error <= 1)
    r  = (w*x - q*p) mod 2^256        (low columns only)
    r in [0, 3p); one conditional subtract of 2p keeps the lazy invariant
    x, outputs in [0, 2p).
Mult count ~1.7 bigmuls vs Montgomery's 3.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import functools, os, time
import jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stark_tpu.fields.field import BN254_FR as spec, int_to_limbs
from stark_tpu.ops import pallas_field as pf

MASK = pf.MASK
SHIFT = pf.SHIFT
L = spec.num_limbs
P_INT = spec.p
R = 1 << 256
P = lambda *a: print(*a, flush=True)


def _carry_rows(rows):
    out, c = [], None
    for v in rows:
        v = v if c is None else v + c
        out.append(v & MASK)
        c = v >> SHIFT
    return out, c


def _mul_cols_range(A_rows, B_rows, lo_col, hi_col):
    """Deferred columns lo_col..hi_col (inclusive) of the 2L-limb product of
    row lists A, B (each length L, 16-bit canonical)."""
    Lr = len(A_rows)
    # compute needed 16x16-bit products lazily (only the requested columns)
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


def _shoup_mul_rows(spec, W, Wp, X):
    """W, Wp constant-twiddle row lists; X data rows (< 2p, 16-bit limbs).
    Returns rows of (W*X mod p) in [0, 2p) (lazy)."""
    Lr = spec.num_limbs
    Pl = spec.p_limbs
    T = X[0].shape[-1]

    # q_hat = floor(Wp*X / R) approx from columns L-2 .. 2L
    hi_cols = _mul_cols_range(Wp, X, Lr - 2, 2 * Lr)
    hc, _ = _carry_rows(hi_cols)
    qhat = hc[2: 2 + Lr]  # columns L .. 2L-1

    # low products mod R
    wx = _mul_cols_range(W, X, 0, Lr - 1)
    wx, _ = _carry_rows(wx)
    pconst = [jnp.full((T,), np.uint32(c), jnp.uint32) for c in Pl]
    qp = _mul_cols_range(qhat, pconst, 0, Lr - 1)
    qp, _ = _carry_rows(qp)

    # r = wx - qp (mod R); result in [0, 3p)
    r = []
    c = jnp.ones_like(wx[0])
    for i in range(Lr):
        v = wx[i] + (MASK - qp[i]) + c
        r.append(v & MASK)
        c = v >> SHIFT
    return _cond_sub_rows(r, [(2 * P_INT >> (16 * i)) & 0xFFFF for i in range(Lr)])


def _cond_sub_rows(rows, mod_limbs):
    Lr = len(rows)
    diff = []
    c = jnp.ones_like(rows[0])
    for i in range(Lr):
        v = rows[i] + np.uint32(MASK - mod_limbs[i]) + c
        diff.append(v & MASK)
        c = v >> SHIFT
    ge = c > 0
    return [jnp.where(ge, diff[i], rows[i]) for i in range(Lr)]


def _shoup_kernel(spec, w_ref, wp_ref, x_ref, o_ref):
    W = pf._rows(w_ref[:])
    Wp = pf._rows(wp_ref[:])
    X = pf._rows(x_ref[:])
    out = _shoup_mul_rows(spec, W, Wp, X)
    o_ref[:] = jnp.stack(out, axis=0)


def shoup_mul(w, wp, x, tile=1024):
    Ln, n = x.shape
    return pl.pallas_call(
        functools.partial(_shoup_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((Ln, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((Ln, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ln, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ln, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Ln, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(w, wp, x)


def to_planes(ints, n):
    a = np.zeros((L, n), np.uint32)
    for t, v in enumerate(ints):
        for i in range(L):
            a[i, t] = (v >> (16 * i)) & 0xFFFF
    return a


if __name__ == "__main__":
    N = 1 << 20
    rng = np.random.default_rng(0)
    # random canonical w, x
    n_chk = 512
    ws = [int(rng.integers(0, 1 << 62)) ** 4 % P_INT for _ in range(n_chk)]
    xs = [int(rng.integers(0, 1 << 62)) ** 4 % P_INT for _ in range(n_chk)]
    w_np = to_planes(ws, n_chk)
    wp_np = to_planes([w * R // P_INT for w in ws], n_chk)
    x_np = to_planes(xs, n_chk)
    f = jax.jit(lambda w, wp, x: shoup_mul(w, wp, x, tile=n_chk))
    got = np.asarray(f(jnp.asarray(w_np), jnp.asarray(wp_np), jnp.asarray(x_np)))
    ok = True
    for t in range(n_chk):
        g = sum(int(got[i, t]) << (16 * i) for i in range(L))
        want = ws[t] * xs[t] % P_INT
        if g % P_INT != want or g >= 2 * P_INT:
            ok = False
            P("MISMATCH", t, g, want)
            break
    P("shoup correct (mod p, <2p):", ok)

    # timing at 2^20
    a_np = rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32)
    a_np[L - 1] &= 0x3FFF
    a = jnp.asarray(a_np)
    b = jnp.asarray(np.roll(a_np, 7, axis=1))
    c = jnp.asarray(np.roll(a_np, 13, axis=1))
    force = jax.jit(lambda x: jnp.sum(x))

    def bench(name, fn, *args, iters=5):
        out = fn(*args)
        np.asarray(force(out))
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(force(out))
        dt = (time.time() - t) / iters * 1e3
        P("%-28s %8.2f ms   (%.0f Melem/s)" % (name, dt, N / dt / 1e3))

    bench("mont pf.mmul 2^20", jax.jit(lambda x, y: pf.mmul(spec, x, y)), a, b)
    bench("shoup mul   2^20", jax.jit(lambda w, wp, x: shoup_mul(w, wp, x)), a, b, c)
