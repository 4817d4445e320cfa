"""Differential tests: device NTT / fold / Rescue kernels vs host models."""

import random

import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.ntt import NTT
from stark_tpu.ops import field_ops as fo
from stark_tpu.ops import fold as dev_fold
from stark_tpu.ops import rescue as dev_rescue
from stark_tpu.ops.limbs import pack, unpack
from stark_tpu.ops.ntt import get_plan
from stark_tpu.params import GENERATOR, P
from stark_tpu.rescue_prime import RescuePrime


def _to_dev_mont(vals):
    import jax.numpy as jnp

    return fo.to_mont(jnp.asarray(pack(vals)))


def _from_dev_mont(arr):
    import jax

    return unpack(np.asarray(jax.device_get(fo.from_mont(arr))))


@pytest.mark.parametrize("n", [8, 64, 256, 1024])
def test_device_ntt_matches_host(n):
    rng = random.Random(n)
    vals = [rng.randrange(P) for _ in range(n)]
    plan = get_plan(n)
    host = NTT(n)
    got = _from_dev_mont(plan.forward(_to_dev_mont(vals)))
    assert got == host.forward(vals)
    got_inv = _from_dev_mont(plan.inverse(_to_dev_mont(vals)))
    assert got_inv == host.inverse(vals)


def test_device_ntt_round_trip():
    n = 512
    rng = random.Random(512)
    vals = [rng.randrange(P) for _ in range(n)]
    plan = get_plan(n)
    assert _from_dev_mont(plan.inverse(plan.forward(_to_dev_mont(vals)))) == vals


@pytest.mark.parametrize("n", [64, 512])
def test_device_coset_ntt_matches_host(n):
    rng = random.Random(n + 1)
    vals = [rng.randrange(P) for _ in range(n)]
    plan = get_plan(n)
    host = NTT(n)
    got = _from_dev_mont(plan.coset_forward(_to_dev_mont(vals), GENERATOR))
    assert got == host.coset_evaluate(vals, GENERATOR)
    back = _from_dev_mont(plan.coset_inverse(_to_dev_mont(got), GENERATOR))
    assert back == vals


def test_device_fold_matches_host():
    from stark_tpu.fri import Fri
    from stark_tpu.proof_stream import ProofStream

    n = 512
    rng = random.Random(3)
    codeword = [rng.randrange(P) for _ in range(n)]
    alpha = rng.randrange(P)
    omega = FieldElement.primitive_nth_root(n).value
    offset = GENERATOR

    fri = Fri(FieldElement(offset), FieldElement(omega), n, 4, 2)
    host_folded = fri._fold(codeword, alpha, offset, omega)
    dev_folded = dev_fold.fri_fold(codeword, alpha, offset, omega)
    assert dev_folded == host_folded


def test_device_rescue_hash_matches_host():
    rp = RescuePrime()
    rng = random.Random(4)
    inputs = [1, 57322816861100832358702415967512842988] + [
        rng.randrange(P) for _ in range(14)
    ]
    got = dev_rescue.hash_batch(inputs)
    want = [rp.hash(FieldElement(v)).value for v in inputs]
    assert got == want
    # golden vectors ride along
    assert got[0] == 244180265933090377212304188905974087294
    assert got[1] == 89633745865384635541695204788332415101


def test_device_rescue_trace_matches_host():
    rp = RescuePrime()
    rng = random.Random(5)
    inputs = [rng.randrange(P) for _ in range(4)]
    traces = dev_rescue.trace_batch(inputs)
    assert traces.shape == (4, rp.N + 1, rp.m)
    for i, v in enumerate(inputs):
        host_trace = rp.trace(FieldElement(v))
        for c in range(rp.N + 1):
            for r in range(rp.m):
                assert traces[i, c, r] == host_trace[c][r].value
