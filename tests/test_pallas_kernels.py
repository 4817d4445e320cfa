"""Pallas kernel correctness in interpreter mode (CPU CI).

Compiled-mode (Mosaic/TPU) parity is exercised by the benchmark drives on
real hardware; these tests pin the kernel MATH against the XLA/host paths
at sizes small enough for the interpreter.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.ntt import NTT
from stark_tpu.ops import field_ops as fo
from stark_tpu.ops.fold import _fold_tables, fold_mont
from stark_tpu.ops.limbs import pack, unpack
from stark_tpu.params import GENERATOR, P, R_MOD_P


def test_pallas_fold_matches_xla():
    from stark_tpu.ops.pallas_fold import fold_mont_pallas

    n = 512
    rng = random.Random(3)
    vals = [rng.randrange(P) for _ in range(n)]
    cw = fo.to_mont(jnp.asarray(pack(vals)))
    omega = FieldElement.primitive_nth_root(n).value
    tab = jnp.asarray(_fold_tables(GENERATOR, omega, n // 2))
    alpha = fo.to_mont(jnp.asarray(pack([12345])))
    want = fold_mont(cw, alpha, tab)
    got = fold_mont_pallas(cw, alpha, tab, block=128, interpret=True)
    assert (np.asarray(got) == np.asarray(want)).all()


@pytest.fixture()
def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import stark_tpu.ops.pallas_ntt as pntt

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pntt.pl, "pallas_call", patched)
    return pntt


def test_pallas_ntt_forward_inverse(_interpret_pallas):
    pntt = _interpret_pallas
    # lane_block=64 is fine for the interpreter (the Mosaic 128-lane
    # block rule only applies to compiled kernels)
    n = 1 << 12
    plan = pntt.PallasNTT(n, lane_block=64)
    rng = random.Random(0)
    vals = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(pack([v * R_MOD_P % P for v in vals]))
    host = NTT(n)
    got = unpack(np.asarray(jax.device_get(fo.from_mont(plan.forward(a)))))
    assert got == host.forward(vals)
    got = unpack(np.asarray(jax.device_get(fo.from_mont(plan.inverse(a)))))
    assert got == host.inverse(vals)


def test_pallas_ntt_coset(_interpret_pallas):
    pntt = _interpret_pallas
    # lane_block=64 is fine for the interpreter (the Mosaic 128-lane
    # block rule only applies to compiled kernels)
    n = 1 << 12
    plan = pntt.PallasNTT(n, lane_block=64)
    rng = random.Random(1)
    vals = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(pack([v * R_MOD_P % P for v in vals]))
    host = NTT(n)
    got = unpack(
        np.asarray(jax.device_get(fo.from_mont(plan.coset_forward(a, GENERATOR))))
    )
    assert got == host.coset_evaluate(vals, GENERATOR)
    got = unpack(
        np.asarray(jax.device_get(fo.from_mont(plan.coset_inverse(a, GENERATOR))))
    )
    assert got == host.coset_interpolate(vals, GENERATOR)


def test_pallas_plan_validation():
    from stark_tpu.ops.pallas_ntt import PallasNTT

    with pytest.raises(ValueError):
        PallasNTT(100)
    with pytest.raises(ValueError):
        PallasNTT(1 << 10)  # C=32 < lane_block
