"""Pallas TPU kernel for CRT reconstruction (residues -> canonical limbs).

The XLA lowering of :func:`stark_tpu.ops.crt._reconstruct_math` issues ~130
sequential digit-carry row ops plus four small matmuls per call, which is
launch/HBM-round-trip bound on the TPU (~30 ms at 2^20). Here the whole
body runs in one kernel: residues stream through VMEM in lane blocks, the
digit matmuls run on the MXU via in-kernel ``jnp.dot``, and the carry
ripples stay register/VMEM-resident.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.ops import crt as crt_mod

TILE = 512


def use_pallas(n: int) -> bool:
    v = os.environ.get("STARK_TPU_PALLAS", "auto")
    if v == "0" or n % TILE:
        return False
    if v in ("1", "force"):
        return True
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# fused crt_matmul pipeline (round 5)
#
# The XLA lowering of `crt._crt_matmul_body` materializes ~10 full (P+1, N)
# HBM arrays per call (byte planes, two C-dot outputs, folded residues, the
# twiddle product, two bf16 chunk planes, FOUR f32 matmul outputs, the
# combined residues) -- ~4.7 GB of HBM traffic per 2^20-lane step against
# ~0.3 GB of essential input/output. Two kernels replace the whole middle:
#
#   residues_in : limbs -> [C-dot -> fold -> (pre-multiply -> fold) -> chunk]
#                 one pass; writes only the two bf16 chunk planes.
#   matmul_fold : the four digit matmuls run per (prime, kout-tile, lane-
#                 tile) grid cell with f32 accumulators in VMEM; the
#                 recombine + fold epilogue writes u32 residues directly.
#                 The four (P+1, kout, B) f32 buffers never exist in HBM.
#
# All integer arithmetic is IDENTICAL to the XLA path (and every f32 matmul
# accumulates exact integers < 2^24), so outputs are bit-identical; pinned by
# tests/test_crt.py differentials. Replaces the compute path of the
# reference's `parallel_fft` (`/root/reference/packages/fri/src/fft.rs:
# 195-251`) at full memory-bandwidth efficiency.
# ---------------------------------------------------------------------------

# lane-tile of the residues_in pass and (kout, lane) tile of matmul_fold
RTILE = 2048
TO = 512
TB = 256


def _fold_u32(x, bound_bits, d, q, dmax_bits):
    """In-kernel twin of CrtBasis.fold: d, q broadcastable u32."""
    for _ in range(crt_mod._fold_count(bound_bits, dmax_bits)):
        x = (x >> crt_mod.QBITS) * d + (x & (crt_mod.QBASE - 1))
    for _ in range(2):
        x = jnp.where(x >= q, x - q, x)
    return x


def _to_f(x):
    # Mosaic has no direct (u)int -> bf16 cast; hop through f32 (exact:
    # all values < 2^8 here)
    return x.astype(jnp.int32).astype(jnp.float32)


def _residues_kernel(consts, x_ref, c_ref, d_ref, q_ref, *rest):
    P1, dmax_bits, has_pre = consts
    if has_pre:
        pre_ref, o0_ref, o1_ref = rest
    else:
        (o0_ref, o1_ref) = rest
    x = x_ref[:]
    b0 = _to_f(x & 0xFF).astype(c_ref.dtype)
    b1 = _to_f(x >> 8).astype(c_ref.dtype)
    by = jnp.concatenate([b0, b1], axis=0)  # (2L, T)
    D = jax.lax.dot_general(
        c_ref[:], by, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2*P1, T)
    raw = D[:P1].astype(jnp.int32) + (D[P1:].astype(jnp.int32) << 7)
    d = d_ref[:].astype(jnp.uint32)  # (P1, 1)
    q = q_ref[:].astype(jnp.uint32)
    # fold_signed(raw, 27): |raw| < 2^27
    shift = 27 - crt_mod.QBITS + 1
    r = _fold_u32(raw.astype(jnp.uint32) + (q << shift), 29, d, q, dmax_bits)
    if has_pre:
        prod = r * pre_ref[:].astype(jnp.uint32)  # < 2^28
        r = _fold_u32(prod, 28, d, q, dmax_bits)
    o0_ref[:] = _to_f(r & 127).astype(o0_ref.dtype)
    o1_ref[:] = _to_f(r >> 7).astype(o1_ref.dtype)


def residues_in(basis, x_limbs, pre=None, tile: int = RTILE):
    """(L, N) u32 limb planes -> two (P+1, N) chunk planes (_mat_dtype),
    optionally twiddle-premultiplied: the fused reduce_in+fold+chunk pass."""
    L, n = x_limbs.shape
    p1 = len(basis.qs_host)
    dt = crt_mod._mat_dtype()
    cc = jnp.concatenate([basis.C0_perm(), basis.C1_perm()], axis=0)
    consts = (p1, basis.dmax_bits, pre is not None)
    grid = (n // tile,)
    specs = [
        pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * p1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x_limbs, cc.astype(dt), basis.deltas, basis.qs]
    if pre is not None:
        specs.append(
            pl.BlockSpec((p1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(pre)
    out_spec = pl.BlockSpec((p1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    o0, o1 = pl.pallas_call(
        functools.partial(_residues_kernel, consts),
        out_shape=[
            jax.ShapeDtypeStruct((p1, n), dt),
            jax.ShapeDtypeStruct((p1, n), dt),
        ],
        grid=grid,
        in_specs=specs,
        out_specs=[out_spec, out_spec],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return o0, o1


def _matmul_fold_kernel(dmax_bits, w0_ref, w1_ref, x0_ref, x1_ref,
                        d_ref, q_ref, o_ref):
    w0, w1 = w0_ref[0], w1_ref[0]  # (TO, K)
    x0, x1 = x0_ref[0], x1_ref[0]  # (K, TB)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s00 = dot(w0, x0)
    s01 = dot(w0, x1)
    s10 = dot(w1, x0)
    s11 = dot(w1, x1)
    # per-prime scalars: the (p1, 1) tables ride whole in SMEM (Mosaic
    # rejects sub-(8,128) blocks) and are indexed by the prime grid axis
    p = pl.program_id(0)
    d = d_ref[p, 0].astype(jnp.int32)
    q = q_ref[p, 0].astype(jnp.uint32)
    s11 = s11.astype(jnp.int32)  # |.| <= K*64*127 < 2^23
    s11 = (s11 >> crt_mod.QBITS) * d + (s11 & (crt_mod.QBASE - 1))
    sm = (s01 + s10).astype(jnp.int32)  # |.| <= 2^24
    sm = (sm >> crt_mod.QBITS) * d + (sm & (crt_mod.QBASE - 1))
    raw = s00.astype(jnp.int32) + (sm << 7) + d * s11  # |.| < 2^30
    # fold_signed(raw, 30)
    shift = 30 - crt_mod.QBITS + 1
    du = d_ref[p, 0].astype(jnp.uint32)
    s = _fold_u32(
        raw.astype(jnp.uint32) + (q << shift), 32, du, q, dmax_bits
    )
    o_ref[0] = s


def matmul_fold(basis, plan, x0, x1, to: int = TO, tb: int = TB):
    """Fused digit-matmul + recombine + fold: (P+1, K, B) chunk planes ->
    (P+1, kout, B) u32 residues of (W @ x) mod q per prime."""
    p1, K, B = x0.shape
    kout = plan.kout
    to = min(to, kout)
    tb = min(tb, B)
    grid = (p1, kout // to, B // tb)
    return pl.pallas_call(
        functools.partial(_matmul_fold_kernel, basis.dmax_bits),
        out_shape=jax.ShapeDtypeStruct((p1, kout, B), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, to, K), lambda p, o, b: (p, o, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, to, K), lambda p, o, b: (p, o, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K, tb), lambda p, o, b: (p, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K, tb), lambda p, o, b: (p, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (p1, 1), lambda p, o, b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (p1, 1), lambda p, o, b: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, to, tb), lambda p, o, b: (p, o, b), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(plan.W0, plan.W1, x0, x1, basis.deltas, basis.qs)


def use_fused(n_lanes_in: int, n_lanes_out: int) -> bool:
    """Gate for the fused crt_matmul pipeline: TPU (or forced), tile-aligned
    lane counts both sides."""
    v = os.environ.get("STARK_TPU_CRT_FUSED", "auto")
    if v == "0":
        return False
    if n_lanes_in % RTILE or n_lanes_out % TILE:
        return False
    if v in ("1", "force"):
        return True
    return jax.default_backend() == "tpu" and use_pallas(n_lanes_out)


def crt_matmul_fused(basis, plan, x_limbs, pre=None):
    """Fused twin of `crt._crt_matmul_body` (bit-identical outputs)."""
    L, K, B = x_limbs.shape
    p1 = len(basis.qs_host)
    pre_flat = None if pre is None else pre.reshape(p1, K * B)
    x0, x1 = residues_in(basis, x_limbs.reshape(L, K * B), pre_flat)
    s = matmul_fold(
        basis, plan, x0.reshape(p1, K, B), x1.reshape(p1, K, B)
    )
    out = reconstruct(basis, s.reshape(p1, plan.kout * B))
    return out.reshape(L, plan.kout, B)


def _kernel(consts, s_ref, g_ref, negm_ref, nb_ref, pb_ref, o_ref):
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = crt_mod._reconstruct_math(
        consts, g_ref[:], negm_ref[:], nb_ref[:], pb_ref[:], s_ref[:], dot
    )
    o_ref[:] = out


def reconstruct(basis, s_u32):
    """(P+1, N) u32 -> (16, N) u32 via one fused kernel (N % TILE == 0)."""
    pp1, n = s_u32.shape
    nd2 = basis.G.shape[0]
    dt = crt_mod._mat_dtype()
    grid = (n // TILE,)
    return pl.pallas_call(
        functools.partial(_kernel, basis._consts()),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pp1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd2, basis.P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((crt_mod.ND, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((65, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(
        s_u32,
        basis.G.astype(dt),
        basis.negM_dig,
        basis.NB.astype(dt),
        basis.PB.astype(dt),
    )
