"""TPU bench: bf16 dot rates (progressively sized), then full-scale CRT LDE
vs the pallas butterfly LDE. Run each phase guarded so a hang is attributable.
Usage: python -u _mb_crt_tpu.py [probe|lde]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os, sys, time
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

def bench(name, f, args, macs=None, iters=10):
    t = time.time()
    out = f(*args)
    np.asarray(force(out))
    w = time.time() - t
    t = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(force(out))
    dt = (time.time() - t) / iters
    extra = "  %6.2f TMAC/s" % (macs / dt / 1e12) if macs else ""
    P("%-34s %9.3f ms%s (warm %.1fs)" % (name, dt * 1e3, extra, w))


def probe():
    rng = np.random.default_rng(0)
    dot = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    for n in (256, 512, 1024):
        A = jnp.asarray(rng.integers(-64, 64, (n, n)).astype(np.float32)).astype(jnp.bfloat16)
        B = jnp.asarray(rng.integers(-64, 64, (n, n)).astype(np.float32)).astype(jnp.bfloat16)
        bench("bf16 %d^3" % n, dot, (A, B), macs=n**3)
    # prime-batched shape (the CRT step-B workhorse), modest batch
    bdot = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
    )
    for Pp, bN in ((38, 256), (58, 256), (58, 1024)):
        A = jnp.asarray(rng.integers(-64, 64, (Pp, 1024, 1024)).astype(np.float32)).astype(jnp.bfloat16)
        B = jnp.asarray(rng.integers(-64, 64, (Pp, 1024, bN)).astype(np.float32)).astype(jnp.bfloat16)
        bench("bf16 batched (%d,1024,1024,%d)" % (Pp, bN), bdot, (A, B),
              macs=Pp * 1024 * 1024 * bN, iters=5)


def lde():
    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.ops import modmath as mm
    from stark_tpu.ops import mxu_ntt
    from stark_tpu.ops import ntt as nttm

    steps, precision = 1 << 17, 1 << 20
    p = spec.p
    g2 = spec.root_of_unity(precision)
    g1 = pow(g2, 8, p)
    t0 = time.time()
    inv_plan, big_plan = mxu_ntt.make_lde_plans(spec, g1, g2, steps, precision)
    P("plan build: %.1fs" % (time.time() - t0))

    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 1 << 16, size=(16, steps), dtype=np.uint32)
    a_np[15] &= 0x2FFF
    tr = jnp.asarray(a_np)

    f_mxu = jax.jit(lambda t, ip, bp: mxu_ntt.lde_mxu(ip, bp, t))
    bench("lde_mxu 2^17->2^20", f_mxu, (tr, inv_plan, big_plan), iters=5)

    pplan = nttm.make_lde_plan(spec, g1, g2, steps, precision)
    f_pal = jax.jit(lambda t, pl: nttm.lde(spec, t, pl))
    bench("lde pallas 2^17->2^20", f_pal, (tr, pplan), iters=3)

    # equality spot-check
    om = np.asarray(f_mxu(tr, inv_plan, big_plan))
    op = np.asarray(f_pal(tr, pplan))
    P("equal:", bool((om == op).all()))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    (probe if mode == "probe" else lde)()
