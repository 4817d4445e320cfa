"""Utility module tests: timers, profiling hooks, logging config."""

import time

from stark_tpu.utils import Timer, get_logger, profile_region


def test_timer_regions():
    t = Timer()
    with t.region("a"):
        time.sleep(0.01)
    with t.region("a"):
        pass
    with t.region("b"):
        pass
    assert t.counts["a"] == 2
    assert t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    report = t.report()
    assert "a:" in report and "b:" in report


def test_profile_region_noop_without_env(monkeypatch):
    monkeypatch.delenv("STARK_TPU_PROFILE_DIR", raising=False)
    with profile_region("x"):
        pass  # must be a no-op without the env var


def test_chain_time_measures_device_ops():
    import jax
    import jax.numpy as jnp

    from stark_tpu.utils import chain_time

    calls = []

    @jax.jit
    def step(x):
        return (x * 3 + 1) % 1009

    def counted(x):
        calls.append(1)
        return step(x)

    x0 = jnp.arange(256, dtype=jnp.uint32)
    info = {}
    dt = chain_time(counted, x0, iters=4, repeats=2, details=info)
    assert dt >= 0.0
    # 1 warm-up + repeats * iters chained applications per chain run;
    # sub-floor ops trigger recalibrated re-runs with longer chains
    # (honest sub-ms protocol, round-5), so the call count is at least
    # the initial run's and ends with the final chain length's run
    k = info["iters"]
    assert k >= 4
    assert len(calls) >= 1 + 2 * 4
    assert len(calls) >= 2 * k  # the final run really used k iters
    assert info["chain_s"] > 0 and info["floor_s"] >= 0


def test_chain_time_calibrates_sub_floor_ops():
    """An op much faster than the fetch floor must get a longer chain,
    not a noise-dominated subtraction (the round-4 3.3 G coeffs/s
    artifact)."""
    import jax
    import jax.numpy as jnp

    from stark_tpu.utils import chain_time

    @jax.jit
    def tiny(x):
        return x + 1

    info = {}
    chain_time(tiny, jnp.zeros((8,), jnp.uint32), iters=2, details=info)
    # on any backend a one-add dispatch is far below 50 ms; the chain
    # must have been regrown past the initial 2 iterations
    assert info["iters"] > 2


def test_logger_is_quiet_by_default(capsys):
    log = get_logger("stark_tpu.test")
    log.info("should not appear at default level")
    assert "should not appear" not in capsys.readouterr().err


def test_deterministic_rng_read_many_matches_sequential():
    """read_many (native keccak batch) must produce the exact byte stream
    of sequential calls — the randomizer draws feed pinned transcripts."""
    from stark_tpu.rng import DeterministicRandom, draw_many

    for seed in (0, 7, b"abc", "long-seed-" * 9):
        a = DeterministicRandom(seed)
        b = DeterministicRandom(seed)
        want = [a(17) for _ in range(300)]
        assert b.read_many(300, 17) == want
        # counters advanced identically: the next draw still agrees
        assert a(32) == b(32)

    # draw_many falls back to a loop for plain callables
    calls = []

    def fake(n):
        calls.append(n)
        return bytes(n)

    assert draw_many(fake, 3, 5) == [bytes(5)] * 3
    assert calls == [5, 5, 5]


def test_deterministic_rng_read_many_wide_output():
    """Sizes past the single-squeeze-block kernel fall back to hashlib."""
    from stark_tpu.rng import DeterministicRandom

    a = DeterministicRandom(3)
    b = DeterministicRandom(3)
    want = [a(200) for _ in range(4)]
    assert b.read_many(4, 200) == want


def test_draw_concat_matches_sequential_draws():
    """draw_concat returns the exact concatenation of sequential rng
    calls for DeterministicRandom (counter semantics preserved), bulk
    urandom for the OS rng, and a join fallback for plain callables."""
    from stark_tpu.rng import DeterministicRandom, draw_concat, os_random_bytes

    d1, d2 = DeterministicRandom(9), DeterministicRandom(9)
    assert draw_concat(d1, 300, 17) == b"".join(d2(17) for _ in range(300))
    assert d1._counter == d2._counter == 300

    assert len(draw_concat(os_random_bytes, 64, 17)) == 64 * 17

    calls = []

    def fake(n):
        calls.append(n)
        return bytes(n)

    assert draw_concat(fake, 3, 5) == bytes(15)
    assert calls == [5, 5, 5]
