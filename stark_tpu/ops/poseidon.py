"""Poseidon digest over BLS12-381 Fr, bit-compatible with neptune 5.1.0.

Replicates the reference's `PoseidonDigest`
(`/root/reference/packages/commitment/src/poseidon.rs:30-63`): arity-2
(t = 3), standard strength (8 full / 55 partial rounds), Merkle-tree domain
tag ``2^arity - 1 = 3``, Grain-LFSR round constants, and the symmetric Cauchy
MDS matrix ``M[i][j] = 1/(i + t + j)``. Messages are at most 64 bytes,
zero-padded to a multiple of 32, each 32-byte chunk read little-endian as a
canonical Fr element (`poseidon.rs:31-49`); the digest is the 32-byte
little-endian form of ``state[1]`` after the rounds.

Constant generation follows neptune's port of the Poseidon reference
`generate_parameters_grain`: an 80-bit Grain LFSR seeded with
(field=1, sbox=1, n=255, t, R_F, R_P, 30x1), clocked 160 times, then
self-shrinking-filtered bits are drawn 255 at a time (MSB first) with
rejection sampling below p. Verified against the reference's four KAT
digests (`poseidon.rs:65-106`).

Two implementations share the constants:

* a host path (:func:`poseidon_digest`) on python ints -- used for
  transcript-grade hashing of single messages;
* a device path (:func:`poseidon_hash_pairs`) -- the full permutation as a
  batched JAX kernel over Montgomery limb planes (every sbox/MDS multiply is
  a :func:`stark_tpu.ops.modmath.mmul` over the whole batch), used to fold
  entire Merkle layers at once. The reference hashes Poseidon leaves one at
  a time on one core; this is its TPU-native replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.fields.field import BLS12_381_FR, FieldSpec
from stark_tpu.ops import modmath as mm

T = 3  # arity 2 + 1
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 55
DOMAIN_TAG = 3  # neptune HashType::MerkleTree for arity 2: 2^2 - 1


class _Grain:
    """80-bit Grain LFSR from the Poseidon reference implementation."""

    def __init__(self, field: int, sbox: int, n: int, t: int, r_f: int, r_p: int):
        bits: list[int] = []
        for val, width in ((field, 2), (sbox, 4), (n, 12), (t, 12), (r_f, 10), (r_p, 10)):
            bits += [(val >> (width - 1 - i)) & 1 for i in range(width)]
        bits += [1] * 30
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._clock()

    def _clock(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def next_bit(self) -> int:
        # self-shrinking filter: emit y of each (x, y) pair only when x == 1
        while True:
            x = self._clock()
            y = self._clock()
            if x:
                return y

    def next_field(self, n_bits: int, p: int) -> int:
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.next_bit()
            if v < p:
                return v


@functools.lru_cache(maxsize=None)
def round_constants(
    t: int = T,
    r_f: int = FULL_ROUNDS,
    r_p: int = PARTIAL_ROUNDS,
    p: int = BLS12_381_FR.p,
) -> tuple[int, ...]:
    """t*(R_F+R_P) Grain round constants, in consumption order."""
    g = _Grain(1, 1, 255, t, r_f, r_p)
    return tuple(g.next_field(255, p) for _ in range(t * (r_f + r_p)))


@functools.lru_cache(maxsize=None)
def mds_matrix(t: int = T, p: int = BLS12_381_FR.p) -> tuple[tuple[int, ...], ...]:
    """Cauchy MDS with x_i = i, y_j = t + j (symmetric: 1/(i + t + j))."""
    return tuple(tuple(pow(i + t + j, p - 2, p) for j in range(t)) for i in range(t))


def _permute_host(state: list[int], p: int) -> list[int]:
    rc = round_constants(p=p)
    mds = mds_matrix(p=p)
    off = 0
    half = FULL_ROUNDS // 2
    for rnd in range(FULL_ROUNDS + PARTIAL_ROUNDS):
        state = [(s + rc[off + i]) % p for i, s in enumerate(state)]
        off += T
        if half <= rnd < half + PARTIAL_ROUNDS:
            state[0] = pow(state[0], 5, p)
        else:
            state = [pow(s, 5, p) for s in state]
        state = [sum(mds[i][j] * state[i] for i in range(T)) % p for j in range(T)]
    return state


def poseidon_digest(message: bytes, spec: FieldSpec = BLS12_381_FR) -> bytes:
    """`PoseidonDigest::hash` (`poseidon.rs:30-63`): <=64-byte message ->
    32-byte little-endian digest. Raises on oversize or non-canonical chunks
    where the reference panics."""
    n = len(message)
    if n > 64:
        raise ValueError(f"poseidon digest input must be <= 64 bytes, got {n}")
    if n == 0:
        raise ValueError("poseidon digest input must be non-empty")
    padded = message + b"\x00" * ((((n - 1) // 32) + 1) * 32 - n)
    state = [DOMAIN_TAG, 0, 0]
    for i, off in enumerate(range(0, len(padded), 32)):
        v = int.from_bytes(padded[off : off + 32], "little")
        if v >= spec.p:
            raise ValueError("chunk is not a canonical BLS12-381 Fr element")
        state[1 + i] = v
    state = _permute_host(state, spec.p)
    return spec.to_bytes_le(state[1])


# ---------------------------------------------------------------------------
# device path: batched permutation over Montgomery limb planes
# ---------------------------------------------------------------------------

def _sbox5(spec: FieldSpec, x):
    x2 = mm.mmul(spec, x, x)
    x4 = mm.mmul(spec, x2, x2)
    return mm.mmul(spec, x4, x)


def poseidon_permute_batch(spec: FieldSpec, state):
    """Batched Poseidon permutation. `state`: length-3 list of (L, N)
    Montgomery limb planes. Returns the permuted state (same layout).

    The 63 rounds run under ONE `lax.scan` body (round constants are a
    scanned input; the partial-round sbox gate is a scanned boolean), so
    the compiled module holds a single round instead of a 63-round unroll
    -- a full protocol pipeline with Poseidon commitments (digest=
    "poseidon") compiles in seconds instead of timing out, and the device
    work is unchanged (everything vectorizes over the N lanes, so a whole
    Merkle layer is one permutation)."""
    rc = round_constants(p=spec.p)
    mds = mds_matrix(p=spec.p)
    L = spec.num_limbs
    total = FULL_ROUNDS + PARTIAL_ROUNDS
    # (total, L, T, 1) scanned round constants; (L, T, T) mds in Montgomery
    rc_mont = jnp.moveaxis(
        mm.mont_consts(spec, list(rc)).reshape(L, total, T), 1, 0
    )[..., None]
    mds_flat = mm.mont_consts(
        spec, [mds[i][j] for i in range(T) for j in range(T)]
    ).reshape(L, T, T)
    half = FULL_ROUNDS // 2
    partial = jnp.asarray(
        np.array(
            [half <= r < half + PARTIAL_ROUNDS for r in range(total)],
            dtype=bool,
        )
    )
    st0 = jnp.stack(state, axis=1)  # (L, T, N): mm ops batch over (T, N)
    n = st0.shape[2]

    def body(st, xs):
        rc_r, part = xs
        st = mm.madd(spec, st, jnp.broadcast_to(rc_r, st.shape))
        sb = _sbox5(spec, st)
        # partial rounds sbox only state[0]; states 1..T-1 pass through
        st = jnp.where(part, jnp.concatenate([sb[:, :1], st[:, 1:]], axis=1), sb)
        outs = []
        for j in range(T):
            acc = None
            for i in range(T):
                m = jnp.broadcast_to(
                    mds_flat[:, i, j][:, None, None], (L, 1, n)
                )
                term = mm.mmul(spec, m, st[:, i : i + 1])
                acc = term if acc is None else mm.madd(spec, acc, term)
            outs.append(acc)
        return jnp.concatenate(outs, axis=1), None

    st, _ = jax.lax.scan(body, st0, (rc_mont, partial))
    return [st[:, i] for i in range(T)]


def poseidon_hash_pairs(spec: FieldSpec, left, right):
    """Batched 2-to-1 Poseidon: (L, N) canonical limb planes `left`/`right`
    -> (L, N) canonical digests. This is the device Merkle-fold primitive
    (replaces per-node `PoseidonDigest::hash` of two 32-byte children)."""
    tag = mm.mont_const(spec, DOMAIN_TAG)
    n = left.shape[-1]
    state = [
        jnp.broadcast_to(tag, (spec.num_limbs, n)),
        mm.to_mont(spec, left),
        mm.to_mont(spec, right),
    ]
    state = poseidon_permute_batch(spec, state)
    return mm.from_mont(spec, state[1])


def poseidon_hash_leaves_np(leaves_np: np.ndarray, spec: FieldSpec = BLS12_381_FR):
    """Batched leaf digest: (N, leaf_bytes<=64) uint8 -> (N, 32) uint8
    little-endian digests, each equal to :func:`poseidon_digest` of the row.

    Zero-pads rows to a multiple of 32 bytes and rejects non-canonical
    chunks, mirroring `poseidon.rs:31-49`."""
    n, leaf_bytes = leaves_np.shape
    if leaf_bytes > 64 or leaf_bytes == 0:
        raise ValueError(f"poseidon leaves must be 1..64 bytes, got {leaf_bytes}")
    n_chunks = ((leaf_bytes - 1) // 32) + 1
    padded = np.zeros((n, n_chunks * 32), dtype=np.uint8)
    padded[:, :leaf_bytes] = leaves_np
    chunks = []
    for c in range(2):
        if c < n_chunks:
            raw = padded[:, c * 32 : (c + 1) * 32]
            ints = [int.from_bytes(raw[i].tobytes(), "little") for i in range(n)]
            if any(v >= spec.p for v in ints):
                raise ValueError("leaf chunk is not a canonical Fr element")
            chunks.append(jnp.asarray(mm.ints_to_limbs_np(ints, spec)))
        else:
            chunks.append(jnp.zeros((spec.num_limbs, n), dtype=jnp.uint32))
    digests = poseidon_hash_pairs(spec, chunks[0], chunks[1])
    return mm.limbs_to_bytes_le_np(np.asarray(digests), spec)
