"""Device chirp interpolation vs the host golden model (bit-exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.geometric import geometric_evaluate, geometric_interpolate
from stark_tpu.ops import field_ops as fo
from stark_tpu.ops.geometric_device import (
    chirp_table,
    device_chirp_eval,
    device_geometric_interpolate,
    device_poly_product,
    prefix_mont_mul,
)
from stark_tpu.ops.limbs import pack, unpack
from stark_tpu.params import P


def _to_device(vals):
    return fo.to_mont(jnp.asarray(pack([v % P for v in vals])))


def _to_host(arr):
    return unpack(np.asarray(fo.from_mont(arr)))


def test_prefix_mont_mul():
    rng = np.random.default_rng(0)
    vals = [int(v) % P for v in rng.integers(1, 1 << 62, 37)]
    out = _to_host(prefix_mont_mul(_to_device(vals)))
    acc = 1
    want = []
    for v in vals:
        acc = acc * v % P
        want.append(acc)
    assert out == want


def test_chirp_table():
    q = FieldElement.primitive_nth_root(128).value
    out = _to_host(chirp_table(q, 20))
    want = [pow(q, k * (k - 1) // 2, P) for k in range(20)]
    assert out == want


def test_device_poly_product():
    rng = np.random.default_rng(1)
    a = [int(v) % P for v in rng.integers(0, 1 << 62, 33)]
    b = [int(v) % P for v in rng.integers(0, 1 << 62, 47)]
    out = _to_host(device_poly_product(_to_device(a), _to_device(b), 79))
    from stark_tpu.ntt import poly_multiply

    want = poly_multiply(a, b)
    want = want + [0] * (79 - len(want))
    assert out == want[:79]


def test_device_chirp_eval():
    q = FieldElement.primitive_nth_root(256).value
    rng = np.random.default_rng(2)
    coeffs = [int(v) % P for v in rng.integers(0, 1 << 62, 41)]
    out = _to_host(device_chirp_eval(_to_device(coeffs), q, 60))
    want = geometric_evaluate(coeffs, 1, q, 60)
    assert out == want


@pytest.mark.parametrize("n,start", [(36, 1), (44, 7), (129, 85), (256, 1)])
def test_device_interpolate_matches_host(n, start):
    q = FieldElement.primitive_nth_root(512).value
    rng = np.random.default_rng(n)
    ys = [int(v) % P for v in rng.integers(0, 1 << 62, n)]
    ys[0] = 0  # zero-value edge
    xs = [start * pow(q, i, P) % P for i in range(n)]
    want = geometric_interpolate(xs, ys, q)
    got = _to_host(device_geometric_interpolate(_to_device(ys), start, q))
    assert got == want


def test_fused_interpolation_matches_host(monkeypatch):
    """The single-dispatch fused interpolation path (the default on
    accelerators, off on CPU for compile time) traces and matches the
    host golden model — the only CI pin for the code path the TPU runs.
    Smallest size on purpose: even n=16 costs ~2 min of XLA:CPU compile."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from stark_tpu.field import FieldElement
    from stark_tpu.geometric import geometric_interpolate
    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops import geometric_device
    from stark_tpu.ops.limbs import pack, unpack
    from stark_tpu.params import P

    monkeypatch.setenv("STARK_TPU_FUSE_INTERP", "1")
    assert geometric_device._fuse_interp()
    n = 16
    q = FieldElement.primitive_nth_root(64).value
    xs = [pow(q, i, P) for i in range(n)]
    ys = [i * 997 % P for i in range(1, n + 1)]
    got_m = geometric_device.device_geometric_interpolate(
        fo.to_mont(jnp.asarray(pack(ys))), 1, q
    )
    got = unpack(np.asarray(jax.device_get(fo.from_mont(got_m))))
    assert got == geometric_interpolate(xs, ys, q)
