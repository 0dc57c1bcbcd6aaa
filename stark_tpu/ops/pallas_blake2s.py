"""Pallas TPU kernel for batched Blake2s-256.

The XLA kernel in :mod:`stark_tpu.ops.blake2s` runs the 10 rounds in a
`lax.fori_loop` whose per-round SIGMA message selection is a dynamic gather
and whose state round-trips HBM; this kernel unrolls all rounds (SIGMA
becomes static row indexing), keeps the whole compression state in VMEM,
and streams one (W, T) tile of messages per grid step -- memory-bound leaf
hashing (~one read of the leaves + one write of the digests).

Semantics identical to `hashlib.blake2s` / the reference's `blake2` crate
(`/root/reference/packages/commitment/src/blake.rs:28-32`), pinned by the
same KATs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.ops.blake2s import _IV, _SIGMA

TILE = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(a, b, c, d, x, y):
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress_rows(h, m, t: int, last: bool):
    """h: list of 8 (T,) rows; m: list of 16 (T,) rows; fully unrolled."""
    v = list(h) + [jnp.broadcast_to(np.uint32(iv), h[0].shape) for iv in _IV]
    v[12] = v[12] ^ np.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ np.uint32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[14] = v[14] ^ np.uint32(0xFFFFFFFF)
    for r in range(10):
        s = _SIGMA[r]
        for i, (ia, ib, ic, id_) in enumerate(
            [
                (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
                (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
            ]
        ):
            x, y = m[s[2 * i]], m[s[2 * i + 1]]
            v[ia], v[ib], v[ic], v[id_] = _g(v[ia], v[ib], v[ic], v[id_], x, y)
    return [h[i] ^ v[i] ^ v[8 + i] for i in range(8)]


def _blake_kernel(msg_len, nblocks, m_ref, o_ref):
    h = [
        jnp.broadcast_to(np.uint32(iv), m_ref.shape[1:]) for iv in _IV
    ]
    h[0] = h[0] ^ np.uint32(0x01010020)  # depth=1, fanout=1, digest 32
    for blk in range(nblocks):
        last = blk == nblocks - 1
        t = msg_len if last else (blk + 1) * 64
        m = [m_ref[blk * 16 + i, :] for i in range(16)]
        h = _compress_rows(h, m, t, last)
    o_ref[:] = jnp.stack(h, axis=0)


@functools.partial(jax.jit, static_argnums=1)
def blake2s_words(msgs, msg_len: int):
    """Pallas drop-in for `blake2s.blake2s_words`: (W, N) uint32 words
    (W = 16*nblocks) -> (8, N) digest words."""
    W, n = msgs.shape
    nblocks = max(1, (msg_len + 63) // 64)
    assert W == nblocks * 16, (W, msg_len)
    t = TILE if n % TILE == 0 else n
    return pl.pallas_call(
        functools.partial(_blake_kernel, msg_len, nblocks),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        grid=(n // t,),
        in_specs=[pl.BlockSpec((W, t), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(msgs)
