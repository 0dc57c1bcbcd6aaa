"""Byte-parity oracle: a deliberately slow, direct re-derivation of the
reference prover in pure host Python (ints + hashlib + json only).

This module is the repo's only defense against *symmetric* prover/verifier
misreadings: the production prover and verifier share helper code, so a
mirrored deviation from the reference would pass every self-consistent e2e
test. The oracle shares **nothing** with `stark_tpu` — its own parsers,
field ops, FFT, Merkle, FRI, transcript, and JSON layout — each derived
independently from the reference sources (cited per function). Its output
for a fixture circuit is committed as a golden file and the real prover's
JSON must equal it byte for byte (`tests/test_parity.py`).

Semantics sources (all under /root/reference/packages/):
  r1cs-stark/src/{run.rs,prove.rs,utils.rs,reader.rs,verify.rs}
  fri/src/{fft.rs,fri.rs,poly_utils.rs}
  commitment/src/{utils.rs,merkle_proof_in_place.rs,merkle_tree.rs,blake.rs}
  circom2bellman_core/src/reader.rs
  ff_utils/src/fp.rs
"""

from __future__ import annotations

import hashlib
import json
import struct

# BN254 scalar field r (fp.rs:9) -- circom's field.
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
GENERATOR = 7  # fp.rs:10

LOG_EXTENSION_FACTOR = 3  # r1cs-stark utils.rs:134
EXTENSION_FACTOR = 8  # utils.rs:135
SPOT_CHECK_SECURITY_FACTOR = 80  # utils.rs:136
MIN_DEG_DIRECT_CHECKING = 16  # fri.rs:14
FRI_QUERIES = 40  # fri.rs:184


def blake(data: bytes) -> bytes:
    """commitment/src/utils.rs:5-10 (Blake2s-256)."""
    return hashlib.blake2s(data).digest()


def to_bytes_le(x: int) -> bytes:
    """fp.rs:39-43: canonical value, 32 bytes LE."""
    return x.to_bytes(32, "little")


def from_bytes_le(b: bytes) -> int:
    """fp.rs:74-76: LE bigint -> decimal string -> from_str (reduces mod p)."""
    return int.from_bytes(b, "little") % P


def mk_seed(parts: list[bytes]) -> str:
    """r1cs-stark utils.rs:51-57: blake of concat, BE bigint decimal string."""
    return str(int.from_bytes(blake(b"".join(parts)), "big"))


def from_str(s: str) -> int:
    """ff's from_str over decimal digits is mod-p arithmetic."""
    return int(s) % P


# ---------------------------------------------------------------------------
# Parsers (circom2bellman_core/src/reader.rs:4-89; r1cs-stark/src/reader.rs:7-42)
# ---------------------------------------------------------------------------


class Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.d, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from("<Q", self.d, self.pos)[0]
        self.pos += 8
        return v

    def take(self, n: int) -> bytes:
        v = self.d[self.pos : self.pos + n]
        self.pos += n
        return v


def parse_r1cs(data: bytes) -> dict:
    r = Reader(data)
    assert r.u32() == int.from_bytes(b"r1cs", "little")
    assert r.u32() == 1  # version
    assert r.u32() == 3  # n_section
    assert r.u32() == 1  # header section type
    r.u64()  # section size
    field_size = r.u32()
    prime = r.take(32)
    n_wires = r.u32()
    n_public_outputs = r.u32()
    n_public_inputs = r.u32()
    n_private_inputs = r.u32()
    n_labels = r.u64()
    n_constraints = r.u32()
    assert r.u32() == 2  # constraint section type
    r.u64()
    constraints = []
    for _ in range(n_constraints):
        factors = []
        for _ in range(3):
            n_coeff = r.u32()
            coeffs = []
            for _ in range(n_coeff):
                wire_id = r.u32()
                value = r.take(32)
                coeffs.append((wire_id, value))
            factors.append(coeffs)
        constraints.append(factors)
    return {
        "field_size": field_size,
        "prime": prime,
        "n_wires": n_wires,
        "n_public_outputs": n_public_outputs,
        "n_public_inputs": n_public_inputs,
        "n_private_inputs": n_private_inputs,
        "n_labels": n_labels,
        "n_constraints": n_constraints,
        "constraints": constraints,
    }


def parse_wtns(data: bytes) -> list[int]:
    r = Reader(data)
    assert r.u32() == 1936618615  # "wtns"
    for _ in range(5):
        r.u32()
    field_size = r.u32()
    r.take(field_size)  # field order
    n_wires = r.u32()
    r.u32()
    r.u32()
    r.u32()
    out = []
    for _ in range(n_wires):
        out.append(int.from_bytes(r.take(field_size), "little") % P)
    return out


# ---------------------------------------------------------------------------
# FFT (fri/src/fft.rs:150-193, 280-380)
# ---------------------------------------------------------------------------


def serial_fft(values: list[int], root: int, log_n: int) -> list[int]:
    """In-place radix-2 DIT with bit-reversal (fft.rs:150-193)."""
    n = 1 << log_n
    assert len(values) == n
    v = list(values)
    for k in range(n):
        rk = int(format(k, f"0{log_n}b")[::-1], 2) if log_n else 0
        if k < rk:
            v[rk], v[k] = v[k], v[rk]
    m = 1
    for _ in range(log_n):
        w_m = pow(root, n // (2 * m), P)
        k = 0
        while k < n:
            w = 1
            for j in range(m):
                t = (v[k + j + m] * w) % P
                v[k + j + m] = (v[k + j] - t) % P
                v[k + j] = (v[k + j] + t) % P
                w = (w * w_m) % P
            k += 2 * m
        m *= 2
    return v


def best_fft(coeffs: list[int], root: int, log_n: int) -> list[int]:
    """Zero-pad then FFT (fft.rs:327-357)."""
    n = 1 << log_n
    v = list(coeffs) + [0] * (n - len(coeffs))
    return serial_fft(v, root, log_n)


def inv_best_fft(evals: list[int], root: int, log_n: int) -> list[int]:
    """FFT at inverse root x n^-1 (fft.rs:284-309,360-379)."""
    n = 1 << log_n
    v = list(evals) + [0] * (n - len(evals))
    inv_root = pow(root, P - 2, P)
    v = serial_fft(v, inv_root, log_n)
    inv_n = pow(n, P - 2, P)
    return [(x * inv_n) % P for x in v]


def expand_root_of_unity(root: int) -> list[int]:
    """fft.rs:5-14: all powers until cycling back to 1."""
    out = [1]
    cur = root % P
    while cur != 1:
        out.append(cur)
        cur = (cur * root) % P
    return out


# ---------------------------------------------------------------------------
# Poly utils (fri/src/poly_utils.rs)
# ---------------------------------------------------------------------------


def multi_inv(values: list[int]) -> list[int]:
    """Batch inversion with zero-skip (poly_utils.rs:38-70)."""
    partials = [1]
    for v in values:
        partials.append(partials[-1] * (v if v != 0 else 1) % P)
    inv = pow(partials[-1], P - 2, P)
    out = [0] * len(values)
    for i in reversed(range(len(values))):
        out[i] = partials[i] * inv % P if values[i] != 0 else 0
        inv = inv * (values[i] if values[i] != 0 else 1) % P
    return out


def eval_poly_at(poly: list[int], x: int) -> int:
    y, power = 0, 1
    for c in poly:
        y = (y + power * c) % P
        power = power * x % P
    return y


def zpoly(xs: list[int]) -> list[int]:
    """poly_utils.rs:362-373."""
    root = [1]
    for i, x in enumerate(xs):
        root.append(0)
        for j in reversed(range(i + 1)):
            root[j + 1] = (root[j + 1] - root[j] * x) % P
    root.reverse()
    return root


def div_polys(a: list[int], b: list[int]) -> list[int]:
    """Long division (poly_utils.rs:235-262)."""
    while len(b) > 1 and b[-1] == 0:
        b = b[:-1]
    assert len(a) >= len(b)
    c = list(a)
    o = []
    apos = len(a) - 1
    bpos = len(b) - 1
    inv_b = pow(b[bpos], P - 2, P)
    for d in reversed(range(apos - bpos + 1)):
        quot = c[apos] * inv_b % P
        o.append(quot)
        for i in reversed(range(bpos + 1)):
            c[d + i] = (c[d + i] - b[i] * quot) % P
        apos -= 1
    o.reverse()
    return o


def lagrange_interp(xs: list[int], ys: list[int]) -> list[int]:
    """poly_utils.rs:409-439 (including the skip-zero-y quirk)."""
    root = zpoly(xs)
    assert len(root) == len(ys) + 1
    nums = [div_polys(root, [(-x) % P, 1]) for x in xs]
    denoms = [eval_poly_at(nums[i], xs[i]) for i in range(len(xs))]
    inv_denoms = multi_inv(denoms)
    b = [0] * len(ys)
    for i in range(len(xs)):
        yslice = ys[i] * inv_denoms[i] % P
        for j in range(len(ys)):
            if nums[i][j] != 0 and ys[i] != 0:
                b[j] = (b[j] + nums[i][j] * yslice) % P
    return b


def eval_quartic(p, x: int) -> int:
    xsq = x * x % P
    xcb = xsq * x % P
    return (p[0] + p[1] * x + p[2] * xsq + p[3] * xcb) % P


def multi_interp_4(xsets, ysets):
    """Closed-form batched degree-4 interpolation (poly_utils.rs:449-511)."""
    data = []
    inv_targets = []
    for xs, ys in zip(xsets, ysets):
        x01 = xs[0] * xs[1] % P
        x02 = xs[0] * xs[2] % P
        x03 = xs[0] * xs[3] % P
        x12 = xs[1] * xs[2] % P
        x13 = xs[1] * xs[3] % P
        x23 = xs[2] * xs[3] % P
        eq0 = [(-x12 * xs[3]) % P, (x12 + x13 + x23) % P, (-xs[1] - xs[2] - xs[3]) % P, 1]
        eq1 = [(-x02 * xs[3]) % P, (x02 + x03 + x23) % P, (-xs[0] - xs[2] - xs[3]) % P, 1]
        eq2 = [(-x01 * xs[3]) % P, (x01 + x03 + x13) % P, (-xs[0] - xs[1] - xs[3]) % P, 1]
        eq3 = [(-x01 * xs[2]) % P, (x01 + x02 + x12) % P, (-xs[0] - xs[1] - xs[2]) % P, 1]
        e0 = eval_quartic(eq0, xs[0])
        e1 = eval_quartic(eq1, xs[1])
        e2 = eval_quartic(eq2, xs[2])
        e3 = eval_quartic(eq3, xs[3])
        data.append((ys, eq0, eq1, eq2, eq3))
        inv_targets.extend([e0, e1, e2, e3])
    inv_alls = multi_inv(inv_targets)
    outputs = []
    for i, (ys, eq0, eq1, eq2, eq3) in enumerate(data):
        iy0 = ys[0] * inv_alls[4 * i] % P
        iy1 = ys[1] * inv_alls[4 * i + 1] % P
        iy2 = ys[2] * inv_alls[4 * i + 2] % P
        iy3 = ys[3] * inv_alls[4 * i + 3] % P
        outputs.append(
            [
                (eq0[j] * iy0 + eq1[j] * iy1 + eq2[j] * iy2 + eq3[j] * iy3) % P
                for j in range(4)
            ]
        )
    return outputs


# ---------------------------------------------------------------------------
# Merkle (commitment/src/merkle_proof_in_place.rs; merkle_tree.rs:25-43)
# ---------------------------------------------------------------------------


def merkle_root_and_proofs(leaves: list[bytes], indices: list[int]):
    """Root + standard sibling-path proofs, bottom-up.

    The reference's chunked in-place builder produces exactly the standard
    root and sibling paths for any worker count (its own differential test
    against SerialMerkleTree asserts this, merkle_proof_in_place.rs:208-261),
    so the oracle computes them directly.
    """
    n = len(leaves)
    assert n & (n - 1) == 0
    layers = [[blake(leaf) for leaf in leaves]]
    while len(layers[-1]) > 1:
        prev = layers[-1]
        layers.append(
            [blake(prev[2 * i] + prev[2 * i + 1]) for i in range(len(prev) // 2)]
        )
    root = layers[-1][0]
    proofs = []
    for idx in indices:
        nodes = []
        t = idx
        for lvl in range(len(layers) - 1):
            nodes.append(layers[lvl][t ^ 1])
            t >>= 1
        proofs.append({"leaf": leaves[idx], "nodes": nodes})
    return root, proofs


def merkle_root(leaves: list[bytes]) -> bytes:
    return merkle_root_and_proofs(leaves, [])[0]


# ---------------------------------------------------------------------------
# Transcript (commitment/src/utils.rs:82-109; r1cs-stark utils.rs:272-290)
# ---------------------------------------------------------------------------


def get_pseudorandom_indices(
    seed: bytes, modulus: int, count: int, exclude_multiples_of: int = 0
) -> list[int]:
    assert modulus < 2**24
    data = bytearray(seed)
    while len(data) < 4 * count:
        data.extend(blake(bytes(data[-32:])))
    if exclude_multiples_of == 0:
        return [
            int.from_bytes(data[i : i + 4], "big") % modulus
            for i in range(0, count * 4, 4)
        ]
    real_modulus = modulus * (exclude_multiples_of - 1) // exclude_multiples_of
    out = []
    for i in range(0, count * 4, 4):
        x = int.from_bytes(data[i : i + 4], "big") % real_modulus
        out.append(x + 1 + x // (exclude_multiples_of - 1))
    return out


def get_random_ff_values(seed: bytes, modulus: int, size: int) -> list[int]:
    """utils.rs:272-290: 8 sampled u32s -> 32 BE-packed bytes read as LE."""
    rand = get_pseudorandom_indices(seed, modulus, size * 8, 0)
    out = []
    for c in range(size):
        chunk = rand[8 * c : 8 * c + 8]
        packed = b"".join(v.to_bytes(4, "big") for v in chunk)
        out.append(from_bytes_le(packed))
    return out


# ---------------------------------------------------------------------------
# Arithmetization (run.rs:109-308, 390-419)
# ---------------------------------------------------------------------------


def arithmetize(r1cs: dict, witness: list[int]):
    n_wires = r1cs["n_wires"]
    wire_using_list: list[list[tuple[int, int]]] = [[] for _ in range(n_wires)]
    wit_segs = [[], [], []]
    trace_segs = [[], [], []]
    coeff_segs = [[], [], []]
    last_coeff_list = []
    acc_n_coeff = 0
    for factors in r1cs["constraints"]:
        n_coeff = max(len(f) for f in factors)
        for region in range(3):
            t = 0
            f = factors[region]
            for i in range(n_coeff):
                if i < len(f):
                    wire_id, value = f[i]
                    w = witness[wire_id]
                    c = from_bytes_le(value)
                    t = (t + c * w) % P
                else:
                    wire_id = n_wires - 1
                    w = witness[wire_id]
                    c = 0
                wire_using_list[wire_id].append((region, len(coeff_segs[region])))
                wit_segs[region].append(w)
                coeff_segs[region].append(c)
                trace_segs[region].append(t)
        acc_n_coeff += n_coeff
        last_coeff_list.append(acc_n_coeff - 1)

    witness_trace = wit_segs[0] + wit_segs[1] + wit_segs[2]
    computational_trace = trace_segs[0] + trace_segs[1] + trace_segs[2]
    coefficients = coeff_segs[0] + coeff_segs[1] + coeff_segs[2]
    n = len(coefficients)
    a_len = n // 3

    flag0 = [1] * n
    flag1 = [1] * n
    for last in last_coeff_list:
        k = (last + 1) % a_len
        flag1[k] = 0
        flag1[k + a_len] = 0
        flag1[k + 2 * a_len] = 0
    flag2 = [0] * n
    for last in last_coeff_list:
        flag2[last] = 1

    permuted_indices = [0] * n
    for vs in wire_using_list:
        if not vs:
            continue
        old_w = a_len * vs[-1][0] + vs[-1][1]
        for k, v in vs:
            w = a_len * k + v
            permuted_indices[w] = old_w
            old_w = w

    n_public = 1 + r1cs["n_public_inputs"] + r1cs["n_public_outputs"]
    public_first_indices = []
    for w in range(n_public):
        if wire_using_list[w]:
            k, v = wire_using_list[w][0]
            public_first_indices.append((w, a_len * k + v))

    return (
        witness_trace,
        computational_trace,
        coefficients,
        flag0,
        flag1,
        flag2,
        permuted_indices,
        public_first_indices,
    )


# ---------------------------------------------------------------------------
# FRI prover (fri/src/fri.rs:46-224)
# ---------------------------------------------------------------------------


def prove_low_degree(values, root_of_unity, max_deg_plus_1, exclude_multiples_of):
    acc = []
    while True:
        xs = expand_root_of_unity(root_of_unity)
        if max_deg_plus_1 <= MIN_DEG_DIRECT_CHECKING:
            # base case (fri.rs:88-112): raw values
            acc.append({"Last": {"last": [list(to_bytes_le(v)) for v in values]}})
            return acc
        leaves = [to_bytes_le(v) for v in values]
        m_root = merkle_root(leaves)
        special_x = from_bytes_le(m_root)
        quarter = len(xs) // 4
        xsets = [[xs[i + quarter * j] for j in range(4)] for i in range(quarter)]
        ysets = [[values[i + quarter * j] for j in range(4)] for i in range(quarter)]
        x_polys = multi_interp_4(xsets, ysets)
        column = [eval_quartic(p, special_x) for p in x_polys]
        col_leaves = [to_bytes_le(v) for v in column]
        m2_root = merkle_root(col_leaves)
        ys = get_pseudorandom_indices(
            m2_root, len(column), FRI_QUERIES, exclude_multiples_of
        )
        _, column_branches = merkle_root_and_proofs(col_leaves, ys)
        poly_positions = [y + quarter * j for y in ys for j in range(4)]
        _, poly_branches = merkle_root_and_proofs(leaves, poly_positions)
        acc.append(
            {
                "Middle": {
                    "root2": list(m2_root),
                    "column_branches": [_proof_json(p) for p in column_branches],
                    "poly_branches": [_proof_json(p) for p in poly_branches],
                }
            }
        )
        values = column
        root_of_unity = pow(root_of_unity, 4, P)
        max_deg_plus_1 //= 4


def _proof_json(p):
    return {"leaf": list(p["leaf"]), "nodes": [list(n) for n in p["nodes"]]}


# ---------------------------------------------------------------------------
# Prover (prove.rs:14-378)
# ---------------------------------------------------------------------------


def mk_r1cs_proof(
    witness_trace,
    computational_trace,
    public_wires,
    public_first_indices,
    permuted_indices,
    coefficients,
    flag0,
    flag1,
    flag2,
):
    original_steps = len(coefficients)
    assert original_steps % 3 == 0
    log_steps = (original_steps - 1).bit_length()  # r1cs-stark log2_ceil
    steps = max(8, 1 << log_steps)
    precision = steps * EXTENSION_FACTOR

    pad = steps - original_steps
    permuted_indices = list(permuted_indices) + list(range(original_steps, steps))
    coefficients = list(coefficients) + [0] * pad
    witness_trace = list(witness_trace) + [0] * pad
    computational_trace = list(computational_trace) + [0] * pad

    g2 = pow(GENERATOR, (P - 1) // precision, P)
    xs = expand_root_of_unity(g2)
    assert len(xs) == precision
    skips = precision // steps
    g1 = xs[skips]
    log_g1 = precision.bit_length() - 1 - LOG_EXTENSION_FACTOR
    log_g2 = precision.bit_length() - 1

    def lde(vals):
        return best_fft(inv_best_fft(vals, g1, log_g1), g2, log_g2)

    k_ev = lde(coefficients)
    f0_ev = lde(flag0)
    f1_ev = lde(flag1)
    f2_ev = lde(flag2)
    s_ev = lde(witness_trace)
    p_ev = lde(computational_trace)

    # Z(X) = X^steps - 1 (utils.rs:173-178)
    z_poly = [(-1) % P] + [0] * (steps - 1) + [1]
    z_ev = best_fft(z_poly, g2, log_g2)

    # Q1 (utils.rs:181-213)
    q1_ev = [
        f0_ev[j]
        * (p_ev[j] - f1_ev[j] * p_ev[(j - skips) % precision] - k_ev[j] * s_ev[j])
        % P
        for j in range(precision)
    ]
    # Q2 (utils.rs:217-248)
    k3 = original_steps // 3
    q2_ev = [
        f2_ev[j]
        * (
            p_ev[(j + 2 * k3 * skips) % precision]
            - p_ev[j] * p_ev[(j + k3 * skips) % precision]
        )
        % P
        for j in range(precision)
    ]

    ext_indices = lde(list(range(steps)))
    ext_permuted = lde(permuted_indices)

    # a_root (utils.rs:250-270): (perm_idx LE u64 || witness) leaves
    a_leaves = [
        permuted_indices[i].to_bytes(8, "little") + to_bytes_le(witness_trace[i])
        for i in range(steps)
    ]
    a_root = merkle_root(a_leaves)
    r = get_random_ff_values(a_root, precision, 3)

    # A accumulator (utils.rs:293-339)
    a_nmr, a_dnm = [], []
    for j in range(steps):
        val_nmr = (r[0] + r[1] * ext_indices[j * skips] + r[2] * witness_trace[j]) % P
        val_dnm = (r[0] + r[1] * ext_permuted[j * skips] + r[2] * witness_trace[j]) % P
        a_nmr.append(val_nmr * (a_nmr[-1] if j else 1) % P)
        a_dnm.append(val_dnm * (a_dnm[-1] if j else 1) % P)
    inv_a_dnm = multi_inv(a_dnm)
    a_mini = [a_nmr[j] * inv_a_dnm[j] % P for j in range(steps)]
    a_ev = lde(a_mini)

    # Q3 (utils.rs:344-376)
    q3_ev = []
    for j in range(precision):
        val_nmr = (r[0] + r[1] * ext_indices[j] + r[2] * s_ev[j]) % P
        val_dnm = (r[0] + r[1] * ext_permuted[j] + r[2] * s_ev[j]) % P
        prev_j = (j - skips) % precision
        q3_ev.append((a_ev[j] * val_dnm - a_ev[prev_j] * val_nmr) % P)

    inv_z = multi_inv(z_ev)
    d1_ev = [q1_ev[j] * inv_z[j] % P for j in range(precision)]
    d2_ev = [q2_ev[j] * inv_z[j] % P for j in range(precision)]
    d3_ev = [q3_ev[j] * inv_z[j] % P for j in range(precision)]

    # I2/Zb2 boundary (utils.rs:421-455)
    i2_xs = [xs[skips * w] for (_, w) in public_first_indices]
    i2_ys = [public_wires[k] for (k, _) in public_first_indices]
    interpolant2 = lagrange_interp(i2_xs, i2_ys)
    i2_ev = [eval_poly_at(interpolant2, x) for x in xs]
    zb2_ev = [1] * precision
    for _, w in public_first_indices:
        xj = xs[w * skips]
        zb2_ev = [zb2_ev[i] * (xs[i] - xj) % P for i in range(precision)]

    # I3/Zb3 (utils.rs:458-474)
    x_last = xs[precision - skips]
    interpolant3 = lagrange_interp([x_last], [1])
    i3_ev = [eval_poly_at(interpolant3, x) for x in xs]
    zb3_ev = [(xs[i] - x_last) % P for i in range(precision)]

    inv_zb2 = multi_inv(zb2_ev)
    b2_ev = [(s_ev[j] - i2_ev[j]) * inv_zb2[j] % P for j in range(precision)]
    inv_zb3 = multi_inv(zb3_ev)
    b3_ev = [(a_ev[j] - i3_ev[j]) * inv_zb3[j] % P for j in range(precision)]

    # m_tree: 256-byte leaves (prove.rs:235-264)
    m_leaves = [
        b"".join(
            to_bytes_le(v)
            for v in (
                p_ev[j],
                a_ev[j],
                s_ev[j],
                d1_ev[j],
                d2_ev[j],
                d3_ev[j],
                b2_ev[j],
                b3_ev[j],
            )
        )
        for j in range(precision)
    ]
    m_root = merkle_root(m_leaves)

    # k0..k10 (prove.rs:274-283)
    k = [1]
    for i in range(1, 11):
        k.append(from_str(mk_seed([m_root, bytes([i])])))

    # L (prove.rs:287-322)
    g2s = xs[steps]
    powers = [1]
    for _ in range(1, precision):
        powers.append(powers[-1] * g2s % P)
    l_ev = [
        (
            k[0] * d1_ev[j]
            + k[1] * d2_ev[j]
            + k[2] * d3_ev[j]
            + k[3] * p_ev[j]
            + k[4] * p_ev[j] * powers[j]
            + k[5] * b2_ev[j]
            + k[6] * b2_ev[j] * powers[j]
            + k[7] * b3_ev[j]
            + k[8] * b3_ev[j] * powers[j]
            + k[9] * a_ev[j]
            + k[10] * s_ev[j]
        )
        % P
        for j in range(precision)
    ]
    l_leaves = [to_bytes_le(v) for v in l_ev]
    l_root = merkle_root(l_leaves)

    positions = get_pseudorandom_indices(
        l_root, precision, SPOT_CHECK_SECURITY_FACTOR, skips
    )
    _, linear_comb_branches = merkle_root_and_proofs(l_leaves, positions)

    augmented_positions = []
    for j in positions:
        augmented_positions.extend(
            [
                j,
                (j + precision - skips) % precision,
                (j + k3 * skips) % precision,
                (j + k3 * 2 * skips) % precision,
            ]
        )
    _, main_branches = merkle_root_and_proofs(m_leaves, augmented_positions)

    fri_proof = prove_low_degree(l_ev, g2, precision // 4, skips)

    return {
        "m_root": list(m_root),
        "l_root": list(l_root),
        "a_root": list(a_root),
        "main_branches": [_proof_json(p) for p in main_branches],
        "linear_comb_branches": [_proof_json(p) for p in linear_comb_branches],
        "fri_proof": fri_proof,
    }


def prove_fixture(r1cs_bytes: bytes, wtns_bytes: bytes) -> str:
    """Full pipeline: parse -> arithmetize -> prove -> serde_json string
    (run.rs:310-452 + prove.rs + serde layout)."""
    r1cs = parse_r1cs(r1cs_bytes)
    assert r1cs["prime"] == P.to_bytes(32, "little")
    witness = parse_wtns(wtns_bytes)
    assert witness[0] == 1
    n_public = 1 + r1cs["n_public_inputs"] + r1cs["n_public_outputs"]
    public_wires = witness[:n_public]
    (
        witness_trace,
        computational_trace,
        coefficients,
        flag0,
        flag1,
        flag2,
        permuted_indices,
        public_first_indices,
    ) = arithmetize(r1cs, witness)
    proof = mk_r1cs_proof(
        witness_trace,
        computational_trace,
        public_wires,
        public_first_indices,
        permuted_indices,
        coefficients,
        flag0,
        flag1,
        flag2,
    )
    return json.dumps(proof, separators=(",", ":"))


if __name__ == "__main__":
    import sys

    with open(sys.argv[1], "rb") as f:
        r1cs_bytes = f.read()
    with open(sys.argv[2], "rb") as f:
        wtns_bytes = f.read()
    out = prove_fixture(r1cs_bytes, wtns_bytes)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            f.write(out)
    else:
        print(out)
