"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: Rescue-Prime STARK prove wall-clock at the reference's
small config (expansion 4, 2 colinearity tests, 28-cycle trace), with the
TPU backend attached.  ``vs_baseline`` is the reference's prose-claimed
~12 s prove time divided by ours (>1 = faster than the reference;
see BASELINE.md — the reference commits no measured numbers).

Extra metrics (in the "extra" field): single-chip NTT throughput at 2^20
coefficients (the north-star metric), batched Rescue-Prime hash
throughput, FRI fold throughput, verify wall-clock, and a TPU-scale
Fibonacci prove (2^16 steps, 2^20 FRI domain).

Robustness (round-2 lesson: the driver's run timed out mid-stage and the
whole round's number was lost):

* All stages run on a worker thread that records results incrementally;
  the main thread waits at most ``STARK_TPU_BENCH_BUDGET_S`` (default
  420 s) and then prints whatever completed as the single JSON line and
  exits 0.  A hung TPU dispatch therefore cannot eat the headline.
* Each stage is individually exception-isolated — a tunnel flake in one
  TPU stage does not lose the host-path metrics.
* The persistent compilation cache lives at <repo>/.jax_cache
  (gitignored): /tmp is wiped between sessions, which cost rounds 2-3
  their flagship numbers; the repo directory persists on the machine the
  driver benches on.  Warming it with a full bench run AFTER the final
  compute-path commit makes the driver's run warm.  Entries are tens of
  MB of executables — gitignored, never committed.  The cache is
  TPU-only (XLA:CPU readback aborts; tests/conftest.py uses no cache).
* Stage order is flagship-first: each flagship warms ONLY its own
  modules and is benched immediately, so even a truncated cold run
  records the fibonacci number.

Runs on the real TPU (no platform overrides here — tests/conftest.py
forces CPU for unit tests only).
"""

import json
import os
import sys
import threading
import time

import jax

# Persistent compile cache lives IN THE REPO (gitignored): /tmp is wiped
# between sessions on this machine, which cost rounds 2 and 3 their
# flagship numbers — the driver's ~30 min budget cannot absorb a fully
# cold ~25-module compile.  The repo directory persists, so a warm run
# after the last compute-path commit makes the driver's run warm.
_REPO = os.path.dirname(os.path.abspath(__file__))
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("STARK_TPU_CACHE_DIR", os.path.join(_REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# round-2 forensics: the driver's own timeout is ~30 min (its r02 run was
# killed >25 min into the fibonacci stage), so 27 min leaves margin to
# emit the JSON line even on a fully cold-compile run
BUDGET_S = float(os.environ.get("STARK_TPU_BENCH_BUDGET_S", "1620"))
T_START = time.time()


def mark(stage):
    # stderr progress markers: the driver parses stdout's single JSON
    # line only; these make a timed-out cold-compile run diagnosable
    print(f"[bench +{time.time() - T_START:7.1f}s] {stage}",
          file=sys.stderr, flush=True)


def _bench_prove():
    from stark_tpu.field import FieldElement
    from stark_tpu.ops.backend import JaxBackend
    from stark_tpu.rescue_prime import RescuePrime
    from stark_tpu.rng import DeterministicRandom
    from stark_tpu.stark import Stark

    rp = RescuePrime()
    input_element = FieldElement.sample(b"0xdeadbeef")
    output_element = rp.hash(input_element)
    backend = JaxBackend()

    def run(seed):
        stark = Stark(4, 2, 2, rp.m, rp.N + 1, backend=backend,
                      rng=DeterministicRandom(seed))
        trace = rp.trace(input_element)
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(output_element)
        t0 = time.perf_counter()
        proof = stark.prove(trace, air, boundary)
        dt = time.perf_counter() - t0
        t1 = time.perf_counter()
        ok = stark.verify(proof, air, boundary)
        vt = time.perf_counter() - t1
        assert ok, "benchmark proof failed to verify"
        return dt, vt, len(proof)

    run(0)  # warm-up (compiles cached afterwards)
    times = [run(s) for s in range(1, 4)]
    prove = min(t[0] for t in times)
    verify = min(t[1] for t in times)
    return prove, verify, times[0][2]


def _ntt_parity_check(logns=(16, 20)):
    """On-hardware bit-equality: the compiled Pallas four-step NTT must
    match the XLA stage-by-stage plan on CANONICAL Montgomery inputs at
    a mid size and the benchmark size, on the real device, before
    anything is timed (VERDICT r1: interpret-mode tests alone don't pin
    the compiled kernel).  Returns True; raises on any mismatch."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops.limbs import pack
    from stark_tpu.ops.ntt import get_plan
    from stark_tpu.ops.pallas_ntt import get_pallas_plan
    from stark_tpu.params import GENERATOR, P

    for logn in logns:
        n = 1 << logn
        rng = np.random.default_rng(42)
        # canonical residues (not raw 16-bit noise): pack enforces < p
        vals = [int(v) % P for v in rng.integers(0, 1 << 63, n, dtype=np.int64)]
        a = fo.to_mont(jnp.asarray(pack(vals)))
        xla = get_plan(n)
        pallas = get_pallas_plan(n)
        for tag, f_x, f_p in [
            ("forward", xla.forward, pallas.forward),
            ("coset_forward",
             lambda x: xla.coset_forward(x, GENERATOR),
             lambda x: pallas.coset_forward(x, GENERATOR)),
            ("inverse", xla.inverse, pallas.inverse),
        ]:
            want = np.asarray(jax.device_get(fo.from_mont(f_x(a))))
            got = np.asarray(jax.device_get(fo.from_mont(f_p(a))))
            if not np.array_equal(want, got):
                raise AssertionError(
                    f"Pallas NTT {tag} mismatch vs XLA plan at 2^{logn}"
                )
    return True


def _bench_ntt(logn=20, iters=10):
    """Fetch-bracketed chain timing (utils.profiling.chain_time):
    block_until_ready alone can return before compute finishes on this
    backend, so the chain is timed through a host fetch of the result."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.ops.backend import best_plan
    from stark_tpu.params import P
    from stark_tpu.utils.profiling import chain_time

    n = 1 << logn
    plan = best_plan(n)  # Pallas four-step on TPU at this size
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
    a = jnp.asarray(limbs)
    dt = chain_time(plan.forward, a, iters=iters)
    return n / dt, dt


def _fib_model():
    from stark_tpu.models.fibonacci import FibonacciStark
    from stark_tpu.ops.backend import JaxBackend
    from stark_tpu.rng import DeterministicRandom

    log_steps = int(os.environ.get("STARK_TPU_BENCH_FIB_LOG", "16"))
    return FibonacciStark(
        1 << log_steps, backend=JaxBackend(), rng=DeterministicRandom(7)
    )


def _chain_model():
    from stark_tpu.models.rescue_chain import RescueChainStark
    from stark_tpu.ops.backend import JaxBackend
    from stark_tpu.rng import DeterministicRandom

    # 4096 hashes -> trace 114688, omicron 2^18, FRI domain 2^20: the
    # SAME codeword-level modules (tree, cascade rounds, ext) as the
    # fibonacci scenario, so the two flagships share their giant
    # compiles and only the combination/interp modules differ
    hashes = int(os.environ.get("STARK_TPU_BENCH_CHAIN_HASHES", "4096"))
    return RescueChainStark(
        hashes, backend=JaxBackend(), rng=DeterministicRandom(3)
    )


def _precompile_model(model, constraints, label, threads=8):
    """Warm ONE flagship's device modules on a thread pool (the remote
    compile service parallelizes across client threads almost
    perfectly).  Scoped per model so the fibonacci flagship can be
    BENCHED the moment its own modules are ready instead of waiting for
    every other stage's compiles (round-3 forensics: a global warm pool
    ate the whole budget and no flagship number landed).  On a warm
    persistent cache each job degrades to a fast disk load."""
    from stark_tpu.ops.precompile import parallel_warm, stark_precompile_jobs

    p1, p2 = stark_precompile_jobs(
        model.stark, constraints, model.air.trace_length
    )
    t = parallel_warm([(f"{label}:{n}", f) for n, f in p1], threads, mark)
    t.update(parallel_warm([(f"{label}:{n}", f) for n, f in p2], threads, mark))
    slow = {k: v for k, v in sorted(t.items(), key=lambda kv: -kv[1])[:6]}
    mark(f"{label} precompile timings (top): {slow}")
    return t


def _precompile_micro(logns=(16, 20), threads=8):
    """Warm the microbench modules (NTT plan variants, batched Rescue)."""
    import jax.numpy as jnp

    from stark_tpu.ops.ntt import get_plan
    from stark_tpu.ops.pallas_ntt import get_pallas_plan
    from stark_tpu.ops.precompile import parallel_warm
    from stark_tpu.params import GENERATOR

    jobs = []
    for logn in logns:
        n = 1 << logn
        z = jnp.zeros((8, n), jnp.uint32)
        for tag, plan in (("xla", get_plan(n)), ("pallas", get_pallas_plan(n))):
            jobs.append((f"{tag}{logn}_fwd", lambda p=plan, z=z: p.forward(z)))
            jobs.append(
                (f"{tag}{logn}_coset",
                 lambda p=plan, z=z: p.coset_forward(z, GENERATOR))
            )
            jobs.append((f"{tag}{logn}_inv", lambda p=plan, z=z: p.inverse(z)))

    def rescue_job():
        from stark_tpu.ops import rescue as rescue_ops

        return rescue_ops.permutation_mont(
            jnp.zeros((8, 2, 4096), jnp.uint32)
        )

    jobs.append(("rescue", rescue_job))
    return parallel_warm(jobs, threads, mark)


def _bench_fibonacci_large(model):
    """TPU-scale proving: Fibonacci at 2^16 steps -> 2^20 FRI domain,
    device-resident prover.  Returns (prove_s, verify_s, fri_domain,
    stage breakdown dict)."""
    from stark_tpu.field import FieldElement

    a, b = FieldElement(1), FieldElement(1)
    assert model.stark._use_device_pipeline()
    r0, p0 = model.prove(a, b)  # warm-up: compile everything once
    model.verify(a, b, r0, p0)  # warm the verifier's point-table caches
    t0 = time.perf_counter()
    result, proof = model.prove(a, b)
    prove_s = time.perf_counter() - t0
    t1 = time.perf_counter()
    ok = model.verify(a, b, result, proof)
    verify_s = time.perf_counter() - t1
    assert ok, "large fibonacci proof failed to verify"
    prof = model.stark.last_profile
    stages = {k: round(v, 3) for k, v in sorted(
        prof.totals.items(), key=lambda kv: -kv[1])}
    return prove_s, verify_s, model.stark.fri_domain_length, stages


def _bench_chain_large(model):
    """TPU-scale chained-permutation proving: 4096 Rescue-Prime hashes
    certified by one proof (trace 114688 rows, 2^20 FRI domain).  The
    reference proves ONE hash in ~12 s; witness generation (the
    inherently sequential hash chain) is reported separately from proof
    generation."""
    from stark_tpu.field import FieldElement

    x = FieldElement(123456789)
    assert model.stark._use_device_pipeline()
    trace = model.air.trace(x)
    output = trace[-1][0]
    boundary = model.air.boundary_constraints(output)
    proof = model.stark.prove(trace, model.constraints, boundary)  # warm
    model.verify(output, proof)  # warm the verifier's caches
    t0 = time.perf_counter()
    trace = model.air.trace(x)
    witness_s = time.perf_counter() - t0
    t1 = time.perf_counter()
    proof = model.stark.prove(trace, model.constraints, boundary)
    prove_s = time.perf_counter() - t1
    t2 = time.perf_counter()
    ok = model.verify(output, proof)
    verify_s = time.perf_counter() - t2
    assert ok, "chain proof failed to verify"
    prof = model.stark.last_profile
    stages = {k: round(v, 3) for k, v in sorted(
        prof.totals.items(), key=lambda kv: -kv[1])}
    return witness_s, prove_s, verify_s, len(proof), stages


def _bench_rescue(batch=4096, iters=5):
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.ops import rescue as rescue_ops
    from stark_tpu.utils.profiling import chain_time

    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.integers(0, 1 << 16, (8, 2, batch), dtype=np.uint32))
    dt = chain_time(rescue_ops.permutation_mont, state, iters=iters)
    return batch / dt


def _bench_fold(logn=20, iters=10):
    """Chained fold timing; the fold halves the codeword, so the chain
    step duplicates the output back up — the extra concat write makes
    this a slight UNDER-estimate of fold throughput."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.field import FieldElement
    from stark_tpu.ops.fold import _fold_tables, fold_mont
    from stark_tpu.params import GENERATOR
    from stark_tpu.utils.profiling import chain_time

    n = 1 << logn
    rng = np.random.default_rng(0)
    cw = jnp.asarray(rng.integers(0, 1 << 16, (8, n), dtype=np.uint32))
    alpha = jnp.asarray(rng.integers(0, 1 << 16, (8, 1), dtype=np.uint32))
    omega = FieldElement.primitive_nth_root(n).value
    tab = jnp.asarray(_fold_tables(GENERATOR, omega, n // 2))

    @jax.jit
    def step(x):
        y = fold_mont(x, alpha, tab)
        return jnp.concatenate([y, y], axis=1)

    dt = chain_time(step, cw, iters=iters)
    return n / dt


def _bench_batch_throughput(n=32):
    from stark_tpu.field import FieldElement
    from stark_tpu.models.rescue_stark import RescueStark

    model = RescueStark()
    inputs = [FieldElement(5000 + i) for i in range(n)]
    model.prove(inputs[0])  # warm caches
    t0 = time.perf_counter()
    results = model.prove_batch(inputs)
    dt = time.perf_counter() - t0
    assert model.verify(*results[0])
    return n / dt


def _worker(result, extra, headline_done):
    """Run every stage in priority order, recording incrementally.

    Stage order = value-per-second: the headline prove and batch
    throughput are host-path (seconds); the parallel warm pool
    front-loads every giant module; the two flagship proves (fibonacci
    2^16, rescue-chain 4096) follow immediately so a truncation loses
    only the microbench timings, whose modules the pool already
    loaded (round 2 lost the whole bench to a mid-stage timeout)."""
    baseline_prove_s = 12.0  # reference CLAUDE.md:115 prose claim

    def stage(name, fn):
        mark(name)
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — isolate tunnel flakes
            msg = f"{type(e).__name__}: {e}"
            extra.setdefault("stage_errors", {})[name] = msg[:300]
            mark(f"{name} FAILED: {msg[:120]}")

    state = {"fib_model": None, "chain_model": None}

    def s_prove():
        prove_s, verify_s, proof_bytes = _bench_prove()
        result["value"] = round(prove_s, 4)
        result["vs_baseline"] = round(baseline_prove_s / prove_s, 2)
        extra["verify_s"] = round(verify_s, 4)
        extra["proof_bytes"] = proof_bytes
        headline_done.set()

    def s_fib_precompile():
        state["fib_model"] = _fib_model()
        _precompile_model(
            state["fib_model"], state["fib_model"]._constraints, "fib"
        )

    def s_chain_precompile():
        state["chain_model"] = _chain_model()
        _precompile_model(
            state["chain_model"], state["chain_model"].constraints, "chain"
        )

    def s_micro_precompile():
        _precompile_micro()

    def s_batch():
        extra["stark_proofs_per_s_single_process"] = round(
            _bench_batch_throughput(), 1)

    def s_parity():
        extra["pallas_vs_xla_bit_equal_2e16_2e20"] = _ntt_parity_check()

    def s_ntt():
        ntt_throughput, ntt_s = _bench_ntt()
        extra["ntt_2e20_coeffs_per_s_per_chip"] = round(ntt_throughput)
        extra["ntt_2e20_seconds"] = round(ntt_s, 4)

    def s_rescue():
        extra["rescue_hashes_per_s"] = round(_bench_rescue())

    def s_fold():
        extra["fri_fold_2e20_elems_per_s"] = round(_bench_fold())

    def s_fib():
        model = state["fib_model"] or _fib_model()
        fib_prove_s, fib_verify_s, fib_domain, fib_stages = (
            _bench_fibonacci_large(model)
        )
        extra["fibonacci_2e16_steps_prove_s"] = round(fib_prove_s, 3)
        extra["fibonacci_2e16_steps_verify_s"] = round(fib_verify_s, 3)
        extra["fibonacci_fri_domain"] = fib_domain
        extra["fibonacci_prove_stages_s"] = fib_stages

    def s_chain():
        model = state["chain_model"] or _chain_model()
        witness_s, prove_s, verify_s, proof_bytes, stages = (
            _bench_chain_large(model)
        )
        extra["rescue_chain_hashes"] = model.air.num_hashes
        extra["rescue_chain_prove_s"] = round(prove_s, 3)
        extra["rescue_chain_witness_s"] = round(witness_s, 3)
        extra["rescue_chain_verify_s"] = round(verify_s, 3)
        extra["rescue_chain_proof_bytes"] = proof_bytes
        extra["rescue_chain_prove_stages_s"] = stages

    stage("prove (small config)", s_prove)
    stage("batch throughput", s_batch)
    # TPU reachability gate: if the tunnel is down, backend init HANGS
    # (observed 2026-08-21: every device stage blocks forever and the
    # whole budget is burned waiting) — probe on a bounded side thread
    # and skip the device stages outright so the host metrics land in
    # minutes, flagged, instead of a budget-exhausted partial.
    probe_ok: list = []

    def _probe():
        try:
            import jax.numpy as jnp

            jnp.ones((4,)).sum().item()
            probe_ok.append(True)
        except Exception:
            pass

    probe_t = threading.Thread(target=_probe, daemon=True)
    mark("tpu probe")
    probe_t.start()
    probe_t.join(timeout=float(os.environ.get(
        "STARK_TPU_BENCH_PROBE_TIMEOUT_S", "240")))
    if not probe_ok:
        extra["tpu_unavailable"] = True
        mark("TPU unreachable: skipping device stages")
        return
    # flagship-first: warm ONLY the fibonacci modules, bench it, then the
    # chain (which shares the 2^20 codeword modules), then microbenches —
    # so a truncated cold run still lands the flagship numbers
    stage("fib precompile", s_fib_precompile)
    stage("fibonacci 2^16 prove", s_fib)
    stage("chain precompile", s_chain_precompile)
    stage("rescue-chain 4096-hash prove", s_chain)
    stage("micro precompile", s_micro_precompile)
    stage("pallas/xla parity check", s_parity)
    if "pallas_vs_xla_bit_equal_2e16_2e20" in extra:
        stage("ntt timing", s_ntt)  # only time what the gate just pinned
    stage("rescue timing", s_rescue)
    stage("fold timing", s_fold)
    mark("done")


def main():
    extra = {}
    result = {
        "metric": "rescue_prime_stark_prove_wall_clock_small_config",
        "value": None,
        "unit": "seconds",
        "vs_baseline": None,
        "extra": extra,
    }
    headline_done = threading.Event()
    all_done = threading.Event()

    def run():
        try:
            _worker(result, extra, headline_done)
        finally:
            all_done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()

    # Grace extension: never print before the headline stage finishes
    # (a None headline is worthless) unless twice the budget has passed.
    all_done.wait(timeout=BUDGET_S)
    if not all_done.is_set() and not headline_done.is_set():
        mark("budget exhausted before headline; extending")
        headline_done.wait(timeout=BUDGET_S)
    if not all_done.is_set():
        extra["bench_truncated_at_s"] = round(time.time() - T_START, 1)
        mark("budget exhausted; emitting partial result")
    extra["bench_total_s"] = round(time.time() - T_START, 1)
    print(json.dumps(result), flush=True)
    # the worker thread may be wedged inside a TPU dispatch; don't join it
    os._exit(0)


if __name__ == "__main__":
    main()
