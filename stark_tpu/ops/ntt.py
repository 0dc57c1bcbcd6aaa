"""Number-theoretic transform (radix-2) over limb fields, TPU-native.

Replaces the reference's `serial_fft`/`parallel_fft`/`best_fft`
(`/root/reference/packages/fri/src/fft.rs:150-379`) with a batched device
NTT. Semantics are the standard DFT: X[k] = sum_j x[j] * w^(jk) with w the
given root of unity, matching the reference exactly (verified against its F7
known-answer tests).

Design notes (TPU/XLA):
* The butterfly loop runs as a `lax.fori_loop` over stages with a *uniform*
  body (constant-geometry formulation): partner indices are `i XOR 2^s` and
  twiddle exponents `(i & (2^s-1)) << (logN-s-1)`, both computable from the
  traced stage index, so the compiled graph contains ONE butterfly body
  instead of logN unrolled stages.
* Twiddles come from a precomputed `(L, N/2)` power table of the root
  (`power_table`, log-depth doubling on device) -- no O(N) host loop like the
  reference's `expand_root_of_unity` (`fft.rs:5-14`).
* The iNTT multiplies by n^{-1} like `inv_best_fft` (`fft.rs:284-309`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.fields.field import FieldSpec
from stark_tpu.ops import modmath as mm


def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for _ in range(logn):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


def forward_table(spec: FieldSpec, root: int, n: int):
    """(L, n/2) powers [1, w, ..., w^(n/2-1)] for an order-n NTT."""
    return mm.power_table(spec, root, max(n // 2, 1))


def inverse_table(spec: FieldSpec, root: int, n: int):
    """Same for w^{-1} (used by the iNTT)."""
    return mm.power_table(spec, spec.inv(root), max(n // 2, 1))


@functools.partial(jax.jit, static_argnums=0)
def _ntt_core(spec: FieldSpec, a, w_half):
    """In-place radix-2 DIT NTT along axis 1.

    a: (L, N) or (L, N, B) Montgomery (B = independent batch columns);
    w_half: (L, N/2)."""
    n = a.shape[1]
    logn = n.bit_length() - 1
    batched = a.ndim == 3
    a = a[:, _bitrev_perm(n)]
    idx = jnp.arange(n, dtype=jnp.uint32)

    def stage(s, a):
        s32 = s.astype(jnp.uint32)
        half = jnp.uint32(1) << s32
        partner = idx ^ half
        b = a[:, partner]
        exp = (idx & (half - 1)) << (jnp.uint32(logn - 1) - s32)
        tw = w_half[:, exp]
        mask = (idx & half) == 0
        if batched:
            tw = tw[:, :, None]
            mask = mask[None, :, None]
        else:
            mask = mask[None, :]
        operand = jnp.where(mask, b, a)
        prod = mm.mmul(spec, jnp.broadcast_to(tw, a.shape), operand)
        lo_out = mm.madd(spec, a, prod)
        hi_out = mm.msub(spec, b, prod)
        return jnp.where(mask, lo_out, hi_out)

    return jax.lax.fori_loop(0, logn, stage, a)


def ntt(spec: FieldSpec, values, w_half):
    """DFT of (L, N) Montgomery values; N a power of two.

    Matches `best_fft` (`fft.rs:327-357`): callers pad inputs with zeros to
    the domain order before calling (see `lde`)."""
    n = values.shape[1]
    assert n & (n - 1) == 0
    if n == 1:
        return values
    assert w_half.shape[1] == n // 2
    return _ntt_core(spec, values, w_half)


def intt(spec: FieldSpec, values, w_inv_half):
    """Inverse DFT (evaluations -> coefficients), like `inv_best_fft`
    (`fft.rs:359-379`): forward NTT at w^{-1}, then scale by n^{-1}."""
    n = values.shape[1]
    out = ntt(spec, values, w_inv_half)
    n_inv = mm.mont_const(spec, spec.inv(n))
    return mm.mmul(spec, out, jnp.broadcast_to(n_inv, out.shape))


def zero_pad(values, n: int):
    """Pad (L, m) to (L, n) with zeros (coefficients of higher degrees)."""
    L, m = values.shape
    if m == n:
        return values
    return jnp.concatenate([values, jnp.zeros((L, n - m), values.dtype)], axis=1)


def lde(spec: FieldSpec, trace, w1_inv_half, w2_half, precision: int):
    """Low-degree extension: interpolate (L, steps) trace on the g1 domain,
    re-evaluate on the g2 domain of size `precision`.

    Mirrors the prover's `inv_best_fft(g1)` / `best_fft(g2)` pairs
    (`prove.rs:100-169`)."""
    coeffs = intt(spec, trace, w1_inv_half)
    return ntt(spec, zero_pad(coeffs, precision), w2_half)
