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
