"""Sharded four-step NTT vs host golden model, on an 8-virtual-device CPU
mesh (the standard multi-chip CI simulation)."""

import random

import jax
import numpy as np
import pytest

from stark_tpu.ntt import NTT
from stark_tpu.ops import field_ops as fo
from stark_tpu.ops.limbs import pack, unpack
from stark_tpu.params import P, R_MOD_P
from stark_tpu.parallel import ShardedNTT, cpu_mesh


def _mont_np(vals):
    return pack([v * R_MOD_P % P for v in vals])


def _unmont(arr):
    import jax.numpy as jnp

    return unpack(np.asarray(jax.device_get(fo.from_mont(jnp.asarray(arr)))))


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_forward_matches_host(n_devices):
    n = 1 << 12
    rng = random.Random(n_devices)
    vals = [rng.randrange(P) for _ in range(n)]
    mesh = cpu_mesh(n_devices)
    sntt = ShardedNTT(n, mesh)

    mat = sntt.to_matrix(_mont_np(vals))
    out = sntt.forward(sntt.shard_input(mat))
    got = _unmont(sntt.from_output_matrix(np.asarray(jax.device_get(out))))

    want = NTT(n).forward(vals)
    assert got == want


def test_sharded_round_trip():
    n = 1 << 11
    rng = random.Random(7)
    vals = [rng.randrange(P) for _ in range(n)]
    mesh = cpu_mesh(4)
    sntt = ShardedNTT(n, mesh)

    mat = sntt.to_matrix(_mont_np(vals))
    fwd = sntt.forward(sntt.shard_input(mat))
    fwd_nat = sntt.from_output_matrix(np.asarray(jax.device_get(fwd)))

    inv = sntt.inverse(sntt.shard_input(sntt.to_matrix(fwd_nat)))
    inv_nat = sntt.from_output_matrix(np.asarray(jax.device_get(inv)))
    assert _unmont(inv_nat) == vals


def test_sharded_inverse_matches_host():
    n = 1 << 12
    rng = random.Random(3)
    vals = [rng.randrange(P) for _ in range(n)]
    mesh = cpu_mesh(8)
    sntt = ShardedNTT(n, mesh)

    mat = sntt.to_matrix(_mont_np(vals))
    out = sntt.inverse(sntt.shard_input(mat))
    got = _unmont(sntt.from_output_matrix(np.asarray(jax.device_get(out))))
    assert got == NTT(n).inverse(vals)


def test_split_validation():
    mesh = cpu_mesh(8)
    with pytest.raises(ValueError):
        ShardedNTT(1 << 5, mesh)  # too small to shard over 8 devices
    with pytest.raises(ValueError):
        ShardedNTT(100, mesh)  # not a power of two


def test_fri_fold_pairs_are_shard_local():
    """The four-step layout keeps FRI fold partners (k, k + n/2) on the
    same shard: k = k1 + R*k2 and k + n/2 = k1 + R*(k2 + C/2) share k1."""
    n = 1 << 12
    mesh = cpu_mesh(8)
    sntt = ShardedNTT(n, mesh)
    R, C = sntt.R, sntt.C
    for k in [0, 1, R - 1, n // 2 - 1, 137]:
        k1, k2 = k % R, k // R
        kp = k + n // 2
        kp1, kp2 = kp % R, kp // R
        assert k1 == kp1  # same row -> same shard
        assert kp2 == k2 + C // 2
