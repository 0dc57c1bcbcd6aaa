"""Granular TPU bisect of the CRT pipeline: run each op category ascending
so the last printed line identifies any wedge. python -u _mb_bisect_crt.py"""

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
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

P = lambda *a: print(*a, flush=True)
force = jax.jit(lambda x: jnp.sum(x))

def run(name, f, *args, iters=3):
    t = time.time()
    out = f(*args)
    np.asarray(force(out))
    w = time.time() - t
    t = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(force(out))
    P("%-40s %9.2f ms (warm %.1fs)" % (name, (time.time() - t) / iters * 1e3, w))

rng = np.random.default_rng(0)
N = 1 << 20

# a) u16 storage + cast + multiply
tw16 = jnp.asarray(rng.integers(0, 15000, (58, N >> 4), dtype=np.uint16))
r32 = jnp.asarray(rng.integers(0, 15000, (58, N >> 4), dtype=np.uint32))
run("u16 cast+mul (58,2^16)", jax.jit(lambda t, r: r * t.astype(jnp.uint32)), tw16, r32)

# b) fold chain at full width
big = jnp.asarray(rng.integers(0, 1 << 30, (58, N), dtype=np.uint32))
d = jnp.asarray(rng.integers(1, 1000, (58, 1), dtype=np.uint32))
def fold3(x, dd):
    for _ in range(3):
        x = (x >> 14) * dd + (x & 16383)
    return x
run("fold chain (58,2^20)", jax.jit(fold3), big, d)

# c/d) wide dots through crt._dot
from stark_tpu.ops import crt
A = jnp.asarray(rng.integers(-64, 64, (37, 57)).astype(np.float32))
B = jnp.asarray(rng.integers(0, 128, (57, N)).astype(np.float32))
run("_dot (37,57)@(57,2^20)", jax.jit(lambda a, b: crt._dot(a, b)), A, B)
A2 = jnp.asarray(rng.integers(-64, 64, (58, 32)).astype(np.float32))
B2 = jnp.asarray(rng.integers(0, 128, (32, 1 << 17)).astype(np.float32))
run("_dot (58,32)@(32,2^17)", jax.jit(lambda a, b: crt._dot(a, b)), A2, B2)

# e) carry digits
cols = jnp.asarray(rng.integers(-(1 << 21), 1 << 21, (35, N), dtype=np.int32))
run("carry_digits (35,2^20)", jax.jit(lambda c: crt._carry_digits(c, 36)), cols)

# f) at[].add
u = jnp.asarray(rng.integers(0, 1 << 20, (65, N), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 255, (36, N), dtype=np.int32))
run("at[:36].add (65,2^20)", jax.jit(lambda u, y: u.at[:36].add(y)), u, y)

# g/h) real basis pieces
from stark_tpu.fields.field import BN254_FR as spec
basis = crt.CrtBasis(spec, 770)
P("basis built P=%d" % basis.P)
x = jnp.asarray(rng.integers(0, 1 << 16, (16, 1 << 18), dtype=np.uint32))
run("reduce_in (16,2^18)", jax.jit(lambda b, xx: b.reduce_in(xx)), basis, x)
s = jnp.asarray(
    rng.integers(0, 15300, (basis.P + 1, 1 << 18), dtype=np.uint32)
)
run("reconstruct (P,2^18)", jax.jit(lambda b, ss: b.reconstruct(ss)), basis, s)

# i) ntt pieces ascending
from stark_tpu.ops import mxu_ntt
from stark_tpu.ops import modmath as mm

for n in (1 << 14, 1 << 17):
    root = spec.root_of_unity(n)
    t0 = time.time()
    plan = mxu_ntt.MxuNttPlan(spec, root, n)
    P("plan n=2^%d built %.1fs" % (n.bit_length() - 1, time.time() - t0))
    xx = jnp.asarray(rng.integers(0, 1 << 14, (16, n), dtype=np.uint32))
    run("ntt_mxu 2^%d" % (n.bit_length() - 1),
        jax.jit(lambda pl, v: mxu_ntt.ntt_mxu(pl, v)), plan, xx)

# j) full LDE
steps, precision = 1 << 17, 1 << 20
g2 = spec.root_of_unity(precision)
g1 = pow(g2, 8, spec.p)
t0 = time.time()
inv_plan, big_plan = mxu_ntt.make_lde_plans(spec, g1, g2, steps, precision)
P("lde plans built %.1fs" % (time.time() - t0))
tr = jnp.asarray(rng.integers(0, 1 << 14, (16, steps), dtype=np.uint32))
run("lde_mxu 2^17->2^20",
    jax.jit(lambda ip, bp, t: mxu_ntt.lde_mxu(ip, bp, t)), inv_plan, big_plan, tr)

# correctness vs pallas path
from stark_tpu.ops import ntt as nttm
pplan = nttm.make_lde_plan(spec, g1, g2, steps, precision)
f_pal = jax.jit(lambda t, pl: nttm.lde(spec, t, pl))
run("lde pallas 2^17->2^20", f_pal, tr, pplan)
om = np.asarray(jax.jit(lambda ip, bp, t: mxu_ntt.lde_mxu(ip, bp, t))(inv_plan, big_plan, tr))
op = np.asarray(f_pal(tr, pplan))
P("lde equal:", bool((om == op).all()))
