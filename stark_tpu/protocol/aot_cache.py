"""AOT executable cache: skip per-process jit TRACING, not just compiles.

The persistent compile cache (`jax_compilation_cache_dir`) removes the
XLA/Mosaic compile wall from a warm host, but every fresh process still
pays GIL-bound jit lowering (~50-80 s of host tracing at steps 2^16 --
the round-4 cold-start residual; BASELINE.md "Round-4: cache-pack").
This module removes the tracing too: the warmup pool already lowers and
compiles every prover stage, so it additionally SERIALIZES each compiled
executable (`jax.experimental.serialize_executable`, the same PjRt
serialization the persistent cache uses); a fresh process then
`deserialize_and_load`s the executable and calls it directly -- no
tracing, no compile, matching the reference's AOT-binary standing start
(`/root/reference/packages/r1cs-stark/src/main.rs:4-11`).

This is NOT the rejected `jax.export` route (BASELINE.md round-4): that
re-compiled the exported StableHLO in every process and missed the
persistent cache. Here the serialized artifact IS the final executable.

Keys: (jax version, device kind, stage name, argument aval signature).
Blobs live in STARK_TPU_AOT_CACHE (default ~/.cache/jax_stark_aot), which
`cli cache-pack` archives alongside the compile cache.

Enabled on real TPU by default; STARK_TPU_AOT=0 disables, =1 forces on
CPU (tests). A loaded executable that fails to call (backend change,
signature drift) falls back to the plain jit path and deletes the blob.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def _enabled() -> bool:
    v = os.environ.get("STARK_TPU_AOT", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


def cache_dir() -> str:
    d = os.path.expanduser(
        os.environ.get("STARK_TPU_AOT_CACHE", "~/.cache/jax_stark_aot")
    )
    return d


def _aval_sig(args, kwargs=None):
    """Stable signature of a call's argument structure: treedef + per-leaf
    (shape, dtype), with non-array leaves (python scalars/statics) by repr."""
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs or {}))
    parts = [str(treedef)]
    for l in leaves:
        shape = getattr(l, "shape", None)
        dtype = getattr(l, "dtype", None)
        if shape is not None and dtype is not None:
            parts.append(f"{tuple(shape)}:{dtype}")
        else:
            parts.append(repr(l)[:64])
    return "|".join(parts)


def _key(name: str, args, kwargs=None) -> str:
    dev = jax.devices()[0]
    raw = "\x00".join(
        [
            "v2",
            jax.__version__,
            getattr(dev, "device_kind", str(dev)),
            name,
            _aval_sig(args, kwargs),
        ]
    )
    return name + "-" + hashlib.sha256(raw.encode()).hexdigest()[:24]


def _path(key: str) -> str:
    return os.path.join(cache_dir(), key + ".jaxexec")


def save(name: str, args, compiled) -> bool:
    """Serialize a `Compiled` stage under (name, args-signature). Called by
    the warmup pool after each target compiles. Best-effort."""
    if not _enabled():
        return False
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cache_dir(), exist_ok=True)
        p = _path(_key(name, args))
        tmp = p + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, p)
        return True
    except Exception:
        return False


def _debug() -> bool:
    return os.environ.get("STARK_TPU_AOT_DEBUG", "0") == "1"


def try_load(name: str, args):
    """Deserialize the stage executable for this call signature, or None."""
    if not _enabled():
        return None
    # debugging aid: STARK_TPU_AOT_SKIP="a,b" disables loading for the
    # named stages (jit path used instead); saving is unaffected
    skip = os.environ.get("STARK_TPU_AOT_SKIP", "")
    if skip and name in skip.split(","):
        return None
    p = _path(_key(name, args))
    try:
        with open(p, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        from jax.experimental import serialize_executable as se

        return se.deserialize_and_load(payload, in_tree, out_tree)
    except FileNotFoundError:
        if _debug():
            print(f"AOT miss {name}: no blob {os.path.basename(p)}", flush=True)
        return None
    except Exception as e:
        if _debug():
            print(f"AOT load failed {name}: {type(e).__name__}: {e}", flush=True)
        # stale/corrupt blob: drop it so the next build rewrites it
        try:
            os.unlink(p)
        except OSError:
            pass
        return None


class wrap:
    """Load-first wrapper around a jitted stage: per call signature, the
    first call tries the serialized executable (no tracing); on miss or
    call failure it falls back to the plain jit path for that signature.

    `static_argnums`: positions the underlying jit treats as static (they
    enter the KEY via repr but are stripped from the Compiled call, which
    takes dynamic args only). One wrapper serves many signatures (e.g.
    the FRI round kernels at 7 shrinking shapes): the memo is keyed per
    signature."""

    def __init__(self, name: str, jit_fn, static_argnums=()):
        self.name = name
        self.jit_fn = jit_fn
        self.static_argnums = frozenset(static_argnums)
        self._memo: dict = {}  # key -> Compiled | False
        self._validated: set = set()  # keys whose first call was checked
        self.__name__ = getattr(jit_fn, "__name__", name)

    def lower(self, *args, **kwargs):  # warmup / profiling passthrough
        return self.jit_fn.lower(*args, **kwargs)

    def _dynamic(self, args):
        if not self.static_argnums:
            return args
        return tuple(
            a for i, a in enumerate(args) if i not in self.static_argnums
        )

    def preload(self, example_args) -> bool:
        """Load the serialized executable using warmup example args (same
        aval signature as the runtime call). Returns True on success."""
        k = _key(self.name, example_args)
        if self._memo.get(k) in (None, False):
            c = try_load(self.name, example_args)
            if c is None:
                return False
            self._memo[k] = c
        return True

    def _store(self, example_args, compiled):
        """Warmup hook: freshly compiled executable for these avals."""
        k = _key(self.name, example_args)
        self._memo[k] = compiled
        self._validated.add(k)

    def __call__(self, *args):
        k = _key(self.name, args)
        c = self._memo.get(k)
        if c is None:
            c = self._memo[k] = try_load(self.name, args) or False
        if c is not False:
            try:
                out = c(*self._dynamic(args))
                if k not in self._validated:
                    # a broken deserialized executable fails ASYNC (the
                    # error would surface at materialize time and poison
                    # the whole proof chain); block once on the first
                    # call's outputs so the failure is catchable HERE,
                    # then drop the blob and recompute via the jit path
                    jax.block_until_ready(out)
                    self._validated.add(k)
                return out
            except Exception as e:
                if _debug():
                    print(
                        f"AOT call failed {self.name}: "
                        f"{type(e).__name__}: {str(e)[:300]}",
                        flush=True,
                    )
                try:
                    os.unlink(_path(k))
                except OSError:
                    pass
                self._memo[k] = False
        return self.jit_fn(*args)
