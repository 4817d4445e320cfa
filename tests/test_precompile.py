"""Parallel AOT precompile: the enumerated modules must cover a real
device prove (no lazy compiles left on the hot path), and precompiling
must not change transcripts."""

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciStark
from stark_tpu.ops.backend import JaxBackend
from stark_tpu.rng import DeterministicRandom


def _fresh(steps=1200):
    # 1208-cycle randomized trace -> 4096 omicron domain -> 16384 FRI
    # domain: crosses device_prover_min AND the cascade's device floor,
    # so the precompile enumeration exercises every job family
    return FibonacciStark(
        steps, backend=JaxBackend(), rng=DeterministicRandom(11)
    )


def test_precompile_covers_real_prove():
    model = _fresh()
    assert model.stark._use_device_pipeline()
    timings = model.precompile(threads=2)
    assert timings and all(v >= 0 for v in timings.values()), timings
    core = model.stark._device_core_cache
    keys_before = set(core._comb_cache)
    ext_traces = core._ext_jit._cache_size()
    ext_mont_traces = core._ext_mont_jit._cache_size()

    a, b = FieldElement(1), FieldElement(1)
    result, proof = model.prove(a, b)
    assert model.verify(a, b, result, proof)

    # the real prove must not have minted any cache entry the
    # enumeration missed — this pins the transcript-prefix arithmetic
    # (cascade body lengths / object counts) and every shape
    assert set(core._comb_cache) == keys_before
    assert core._ext_jit._cache_size() == ext_traces
    assert core._ext_mont_jit._cache_size() == ext_mont_traces

    # byte-identical to an un-precompiled prove (same rng stream)
    model2 = _fresh()
    result2, proof2 = model2.prove(a, b)
    assert result2 == result and proof2 == proof


def test_precompile_noop_without_device_pipeline():
    model = FibonacciStark(16, rng=DeterministicRandom(1))
    assert model.precompile() is None
