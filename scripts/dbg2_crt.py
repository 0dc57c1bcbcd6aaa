"""Isolate the large-scale CRT failure: contraction size sweep + raw bdot
accumulation check."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import jax, numpy as np
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

P = lambda *a: print(*a, flush=True)
rng = np.random.default_rng(9)

# raw batched bf16 dot at worst-case magnitudes: values +-64 x 0..127,
# K = 1024 -> |S| <= 8.32M, must be exact in f32
A = rng.integers(-64, 64, (4, 64, 1024)).astype(np.float32)
B = rng.integers(0, 128, (4, 1024, 256)).astype(np.float32)
bdot = jax.jit(
    lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
)
out_bf = np.asarray(bdot(jnp.asarray(A).astype(jnp.bfloat16),
                         jnp.asarray(B).astype(jnp.bfloat16)))
want = np.einsum("pik,pkj->pij", A.astype(np.int64), B.astype(np.int64))
P("raw bdot K=1024 exact:", bool((out_bf.astype(np.int64) == want).all()),
  "max|err|:", int(np.abs(out_bf.astype(np.int64) - want).max()))

# crt_matmul with K=1024
from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import crt

PP = spec.p

def limbs_np(vals):
    a = np.zeros((16, len(vals)), np.uint32)
    for t, v in enumerate(vals):
        for i in range(16):
            a[i, t] = (v >> (16 * i)) & 0xFFFF
    return a

def ints_of(arr):
    return [sum(int(arr[i, t]) << (16 * i) for i in range(16))
            for t in range(arr.shape[1])]

basis = crt.CrtBasis(spec, 770)
K, kout, b = 1024, 8, 16
w = [[int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(K)] for _ in range(kout)]
plan = crt.CrtMatmulPlan(basis, w)
xs = [[int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(b)] for _ in range(K)]
xa = np.zeros((16, K, b), np.uint32)
for j in range(K):
    xa[:, j, :] = limbs_np(xs[j])
outm = np.asarray(jax.jit(lambda bs, pl, v: crt.crt_matmul(bs, pl, v))(
    basis, plan, jnp.asarray(xa)))
bad = 0
for a in range(kout):
    gots = ints_of(outm[:, a, :])
    for t in range(b):
        if gots[t] != sum(w[a][j] * xs[j][t] for j in range(K)) % PP:
            bad += 1
P("crt_matmul K=1024 mismatches:", bad, "/", kout * b)

# ntt sizes ascending
from stark_tpu.ops import mxu_ntt
from stark_tpu.ops import ntt as nttm
for logn in (14, 16, 18):
    n = 1 << logn
    root = spec.root_of_unity(n)
    vals = [int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(n)]
    xm = jnp.asarray(limbs_np(vals))
    pl = mxu_ntt.MxuNttPlan(spec, root, n)
    o1 = np.asarray(jax.jit(lambda p_, v: mxu_ntt.ntt_mxu(p_, v))(pl, xm))
    w_half = nttm.forward_table(spec, root, n)
    o2 = np.asarray(jax.jit(lambda v, wh: nttm.ntt(spec, v, wh))(xm, w_half))
    eq = bool((o1 == o2).all())
    P("ntt_mxu 2^%d equal:" % logn, eq,
      "" if eq else "(first bad col %d)" % int(np.argwhere((o1 != o2).any(0))[0]))
    if not eq:
        break
