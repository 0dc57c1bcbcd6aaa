"""TPU correctness drill-down for the CRT NTT: find the diverging stage."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os, time
import jax, numpy as np
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

P = lambda *a: print(*a, flush=True)

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import crt, mxu_ntt
from stark_tpu.ops import ntt as nttm

PP = spec.p
rng = np.random.default_rng(5)

def limbs_np(vals):
    a = np.zeros((16, len(vals)), np.uint32)
    for t, v in enumerate(vals):
        for i in range(16):
            a[i, t] = (v >> (16 * i)) & 0xFFFF
    return a

def ints_of(arr):
    return [sum(int(arr[i, t]) << (16 * i) for i in range(16))
            for t in range(arr.shape[1])]

# ---- stage 1: reduce_in at width 2^12
basis = crt.CrtBasis(spec, 770)
n = 1 << 12
vals = [int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(n)]
x = jnp.asarray(limbs_np(vals))
r = np.asarray(jax.jit(lambda b, xx: b.reduce_in(xx))(basis, x))
bad = 0
for i, q in enumerate(basis.qs_host):
    want = np.array([v % q for v in vals], np.uint32)
    bad += int((r[i] != want).sum())
P("reduce_in mismatches:", bad)

# ---- stage 2: reconstruct
qs = np.array(basis.qs_host, np.int64)[:, None]
res = np.array([[v % q for v in vals] for q in basis.qs_host], np.int64)
s = res.copy()
ts = np.array(basis.t_host + [1], np.int64)[:, None]
s[: basis.P] = (res[: basis.P] * ts[: basis.P]) % qs[: basis.P]
out = np.asarray(jax.jit(lambda b, ss: b.reconstruct(ss))(
    basis, jnp.asarray(s.astype(np.uint32))))
rinv = pow(1 << 256, -1, PP)
got = ints_of(out)
bad = sum(1 for g, v in zip(got, vals) if g != v * rinv % PP)
P("reconstruct mismatches:", bad, "/", n)

# ---- stage 3: crt_matmul small K
kk, b = 64, 64
w = [[int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(kk)] for _ in range(kk)]
plan = crt.CrtMatmulPlan(basis, w)
xs = [[int(rng.integers(0, 1 << 62)) ** 5 % PP for _ in range(b)] for _ in range(kk)]
xa = np.zeros((16, kk, b), np.uint32)
for j in range(kk):
    xa[:, j, :] = limbs_np(xs[j])
outm = np.asarray(jax.jit(lambda bs, pl, v: crt.crt_matmul(bs, pl, v))(
    basis, plan, jnp.asarray(xa)))
bad = 0
for a in range(kk):
    gots = ints_of(outm[:, a, :])
    for t in range(b):
        want = sum(w[a][j] * xs[j][t] for j in range(kk)) % PP
        if gots[t] != want:
            bad += 1
P("crt_matmul(64x64x64) mismatches:", bad, "/", kk * b)

# ---- stage 4: ntt_mxu 2^12 vs XLA ntt
root = spec.root_of_unity(n)
from stark_tpu.ops import modmath as mm
xm = jnp.asarray(limbs_np(vals))
plan12 = mxu_ntt.MxuNttPlan(spec, root, n)
o1 = np.asarray(jax.jit(lambda pl, v: mxu_ntt.ntt_mxu(pl, v))(plan12, xm))
w_half = nttm.forward_table(spec, root, n)
o2 = np.asarray(jax.jit(lambda v, wh: nttm.ntt(spec, v, wh))(xm, w_half))
P("ntt_mxu 2^12 equal:", bool((o1 == o2).all()))
P("mat dtype:", crt._mat_dtype())
