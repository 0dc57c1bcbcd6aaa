"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import ntt as nttm
from stark_tpu.parallel import ntt4


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("d",))


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_ntt_matches_single_device(n_dev):
    from jax import shard_map

    mesh = _mesh(n_dev)
    n = 512
    rng = random.Random(n_dev)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    root = spec.root_of_unity(n)

    vm = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))
    expect = mm.limbs_to_ints_np(
        mm.from_mont(spec, nttm.ntt(spec, vm, nttm.forward_table(spec, root, n))),
        spec,
    )

    w_d, w_m, tw = ntt4.make_tables(spec, root, n, n_dev)
    n_inv = None

    body = functools.partial(
        ntt4.ntt_sharded_local, spec, axis_name="d", n_devices=n_dev,
    )

    fn = shard_map(
        lambda x, wd, wm, t: body(x, w_d_half=wd, w_m_half=wm, tw_local=t),
        mesh=mesh,
        in_specs=(P(None, "d"), P(None, None), P(None, None), P(None, None, "d")),
        out_specs=P(None, "d"),
        check_vma=False,
    )
    x_sharded = jax.device_put(vm, NamedSharding(mesh, P(None, "d")))
    out = jax.jit(fn)(x_sharded, w_d, w_m, tw)
    got = mm.limbs_to_ints_np(mm.from_mont(spec, out), spec)
    assert got == expect


def test_sharded_intt_roundtrip():
    from jax import shard_map

    n_dev = 8
    mesh = _mesh(n_dev)
    n = 512
    rng = random.Random(7)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    root = spec.root_of_unity(n)
    vm = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))

    w_d_f, w_m_f, tw_f = ntt4.make_tables(spec, root, n, n_dev)
    w_d_i, w_m_i, tw_i = ntt4.make_tables(spec, root, n, n_dev, inverse=True)
    n_inv = mm.mont_const(spec, spec.inv(n))

    def both(x, a, b, c, d_, e, f):
        y = ntt4.ntt_sharded_local(
            spec, x, "d", n_dev, w_d_half=a, w_m_half=b, tw_local=c
        )
        return ntt4.ntt_sharded_local(
            spec, y, "d", n_dev, w_d_half=d_, w_m_half=e, tw_local=f,
            n_inv_mont=n_inv,
        )

    fn = shard_map(
        both,
        mesh=mesh,
        in_specs=(
            P(None, "d"), P(None, None), P(None, None), P(None, None, "d"),
            P(None, None), P(None, None), P(None, None, "d"),
        ),
        out_specs=P(None, "d"),
        check_vma=False,
    )
    x_sharded = jax.device_put(vm, NamedSharding(mesh, P(None, "d")))
    out = jax.jit(fn)(x_sharded, w_d_f, w_m_f, tw_f, w_d_i, w_m_i, tw_i)
    assert mm.limbs_to_ints_np(mm.from_mont(spec, out), spec) == vals


def test_sharded_prover_step_matches_single_chip():
    """The full sharded prover step must produce identical Merkle roots and
    L evaluations to the single-chip fused core."""
    import jax
    from jax.sharding import NamedSharding

    from stark_tpu.parallel.prove_sharded import build_sharded_prover_step
    from stark_tpu.protocol.core import build_single_chip_step, make_example_inputs
    from stark_tpu.protocol.params import derive_params
    from stark_tpu.r1cs.arithmetize import arithmetize
    from stark_tpu.r1cs.synth import squaring_chain

    n_dev = 8
    mesh = _mesh(n_dev)
    r1cs, wb = squaring_chain(44)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    args = make_example_inputs(spec, arith, witness[:2], params)

    single = build_single_chip_step(
        spec, params.steps, params.precision, arith.original_steps
    )
    m1, l1, lev1 = jax.block_until_ready(single(*args))

    fn = build_sharded_prover_step(
        spec, mesh, params.steps, params.precision, arith.original_steps
    )
    traces, r_mont, k_mont, i2_mont, pubx_mont = args
    xs_full = mm.power_table(spec, params.g2, params.precision)
    shard = NamedSharding(mesh, P(None, "d"))
    traces = {k: jax.device_put(v, shard) for k, v in traces.items()}
    m2, l2, lev2 = jax.block_until_ready(
        fn(traces, jax.device_put(xs_full, shard), r_mont, k_mont, i2_mont, pubx_mont)
    )
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(lev1), np.asarray(lev2))


def test_staged_prover_matches_mono_jit():
    """build_staged_prover (the bench path: one compiled LDE reused per
    column) must produce the same roots/evaluations as the mono-jit core."""
    import numpy as np

    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.protocol.core import (
        build_single_chip_step,
        build_staged_prover,
        make_example_inputs,
    )
    from stark_tpu.protocol.params import derive_params
    from stark_tpu.r1cs.arithmetize import arithmetize
    from stark_tpu.r1cs.synth import squaring_chain

    r1cs, wb = squaring_chain(20)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    args = make_example_inputs(spec, arith, witness[:2], params)
    mono = build_single_chip_step(
        spec, params.steps, params.precision, arith.original_steps
    )
    staged = build_staged_prover(
        spec, params.steps, params.precision, arith.original_steps
    )
    m1, l1, ev1 = mono(*args)
    m2, l2, ev2 = staged(*args)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(ev1), np.asarray(ev2))


def test_lde_mxu_sharded_matches_single_device():
    """GSPMD-sharded CRT LDE == single-device CRT LDE (8-way mesh)."""
    from stark_tpu.ops import mxu_ntt

    mesh = _mesh(8)
    steps, precision = 64, 512
    p = spec.p
    g2 = spec.root_of_unity(precision)
    g1 = pow(g2, precision // steps, p)
    inv_plan, big_plan = mxu_ntt.make_lde_plans(spec, g1, g2, steps, precision)
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 1 << 62)) ** 5 % p for _ in range(steps)]
    tr = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))
    want = np.asarray(mxu_ntt.lde_mxu(inv_plan, big_plan, tr))
    got = np.asarray(mxu_ntt.lde_mxu_sharded(mesh, inv_plan, big_plan, tr))
    assert (got == want).all()
