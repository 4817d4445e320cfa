"""Benchmark suites mirroring the reference's Criterion grid (SURVEY §6),
plus TPU-scale NTT sweeps.

    python benches/run_benches.py --suite all            # everything
    python benches/run_benches.py --suite field,poly     # subset
    python benches/run_benches.py --suite ntt --max-logn 22

Writes benches/results/<suite>.json and prints a markdown table.

Reference suites reproduced (same operation grid):
  field    — benches/field_benchmarks.rs:11-240
  poly     — benches/polynomial_benchmarks.rs:23-248
  fri      — benches/fri_benchmarks.rs:46-270  at (64,4,2),(256,4,4),(1024,8,8)
  stark    — benches/stark_benchmarks.rs:10-179 at small/medium/large
  ntt      — NTT sizes 8..1024 (reference) extended to 2^10..2^22 on device
"""

from __future__ import annotations

import argparse
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stark_tpu.field import FieldElement  # noqa: E402
from stark_tpu.params import GENERATOR, P  # noqa: E402

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def timeit(fn, *, repeat=5, number=1):
    """Best-of wall time per call."""
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        for _ in range(number):
            fn()
        best = min(best, (time.perf_counter() - t0) / number)
    return best


def _fmt(seconds: float) -> str:
    if seconds < 1e-6:
        return f"{seconds*1e9:.0f} ns"
    if seconds < 1e-3:
        return f"{seconds*1e6:.1f} us"
    if seconds < 1:
        return f"{seconds*1e3:.2f} ms"
    return f"{seconds:.2f} s"


def bench_field():
    rng = random.Random(0)
    a = FieldElement(rng.randrange(P))
    b = FieldElement(rng.randrange(1, P))
    out = {}
    out["add"] = timeit(lambda: a + b, number=1000)
    out["sub"] = timeit(lambda: a - b, number=1000)
    out["mul"] = timeit(lambda: a * b, number=1000)
    out["div"] = timeit(lambda: a / b, number=100)
    out["neg"] = timeit(lambda: -a, number=1000)
    out["inverse"] = timeit(lambda: b.inverse(), number=100)
    for e in [2, 32, 1024]:
        out[f"pow_{e}"] = timeit(lambda: a.pow(e), number=1000)
    data = bytes(range(32))
    out["sample_32B"] = timeit(lambda: FieldElement.sample(data), number=1000)
    out["primitive_nth_root_128"] = timeit(
        lambda: FieldElement.primitive_nth_root(128), number=10
    )
    from stark_tpu.serialization import bincode_field_element, json_field_element

    out["bincode_serialize"] = timeit(lambda: bincode_field_element(a), number=1000)
    out["json_serialize"] = timeit(lambda: json_field_element(a), number=1000)
    # batch ops on device
    try:
        import jax

        from stark_tpu.ops import field_ops as fo
        from stark_tpu.ops.limbs import pack

        from stark_tpu.utils.profiling import chain_time

        for n in [1000, 100000]:
            vals = [rng.randrange(P) for _ in range(n)]
            arr = fo.to_mont(jax.numpy.asarray(pack(vals)))
            mul = jax.jit(lambda x: fo.mont_mul(x, arr))
            info_m, info_i = {}, {}
            out[f"device_mul_batch_{n}"] = (
                chain_time(mul, arr, iters=10, details=info_m) / n
            )
            inv = jax.jit(fo.mont_inv)
            out[f"device_inverse_batch_{n}"] = (
                chain_time(inv, arr, iters=5, details=info_i) / n
            )
            # calibration provenance (a round-4 run published 0.0 for
            # the sub-floor mul_batch_1000 row — never again)
            out[f"device_batch_{n}_timing"] = {
                "mul_iters": info_m["iters"],
                "mul_floor_dominated": info_m["floor_dominated"],
                "inv_iters": info_i["iters"],
                "inv_floor_dominated": info_i["floor_dominated"],
            }
    except Exception as exc:  # pragma: no cover
        out["device_error"] = str(exc)
    return out


def bench_poly():
    from stark_tpu.ntt import NTT
    from stark_tpu.poly import Polynomial

    rng = random.Random(1)
    out = {}
    p64 = Polynomial([rng.randrange(P) for _ in range(64)])
    q64 = Polynomial([rng.randrange(P) for _ in range(64)])
    out["add_64"] = timeit(lambda: p64 + q64, number=100)
    out["mul_64"] = timeit(lambda: p64 * q64, number=10)
    out["div_64_by_32"] = timeit(
        lambda: p64 / Polynomial([rng.randrange(P) for _ in range(32)]), number=10
    )
    out["eval_64"] = timeit(lambda: p64.eval(12345), number=100)
    out["compose_16_16"] = timeit(
        lambda: Polynomial([rng.randrange(P) for _ in range(16)]).compose(
            Polynomial([rng.randrange(P) for _ in range(16)])
        ),
        number=5,
    )
    out["zeroifier_64"] = timeit(
        lambda: Polynomial.zeroifier_domain([rng.randrange(P) for _ in range(64)]),
        number=5,
    )
    out["colinearity_3pts"] = timeit(
        lambda: Polynomial.test_colinearity([(0, 0), (1, 1), (2, 2)]), number=100
    )
    for n in [8, 64, 256, 1024]:
        omega = FieldElement.primitive_nth_root(n)
        domain = [omega.pow(i) for i in range(n)]
        coeffs = [rng.randrange(P) for _ in range(n)]
        poly = Polynomial(coeffs)
        out[f"eval_domain_ntt_{n}"] = timeit(
            lambda: poly.eval_domain(domain), number=5
        )
        evals = poly.eval_domain(domain)
        out[f"lagrange_ntt_{n}"] = timeit(
            lambda: Polynomial.lagrange(domain, evals), number=5
        )
        if n <= 64:
            xs = [rng.randrange(P) for _ in range(n)]
            ys = [rng.randrange(P) for _ in range(n)]
            out[f"lagrange_traditional_{n}"] = timeit(
                lambda: Polynomial.lagrange(xs, ys), number=3
            )
    return out


def bench_fri():
    from stark_tpu.fri import Fri, sample_indices
    from stark_tpu.poly import Polynomial
    from stark_tpu.proof_stream import ProofStream

    rng = random.Random(2)
    out = {}
    for (domain_len, expansion, tests) in [(64, 4, 2), (256, 4, 4), (1024, 8, 8)]:
        omega = FieldElement.primitive_nth_root(domain_len)
        fri = Fri(FieldElement.generator(), omega, domain_len, expansion, tests)
        degree = domain_len // expansion - 1
        poly = Polynomial([rng.randrange(P) for _ in range(degree + 1)])
        codeword = [
            fe.value for fe in poly.eval_domain(fri.eval_domain())
        ]
        tag = f"{domain_len}_{expansion}_{tests}"

        out[f"eval_domain_{tag}"] = timeit(lambda: fri.eval_domain(), number=5)
        out[f"commit_{tag}"] = timeit(
            lambda: fri.commit(list(codeword), ProofStream()), number=3
        )

        def prove():
            ps = ProofStream()
            fri.prove(list(codeword), ps)
            return ps

        out[f"prove_{tag}"] = timeit(prove, number=3)
        ps = prove()

        def verify():
            ps2 = ProofStream(list(ps.objects))
            return fri.verify(ps2, [])

        assert verify()
        out[f"verify_{tag}"] = timeit(verify, number=3)
    out["sample_indices_17_of_256"] = timeit(
        lambda: sample_indices(b"\x01" * 32, 256, 16, 10), number=20
    )
    return out


def bench_stark(backend=None):
    from stark_tpu.rescue_prime import RescuePrime
    from stark_tpu.rng import DeterministicRandom
    from stark_tpu.stark import Stark

    rp = RescuePrime()
    inp = FieldElement.sample(b"0xdeadbeef")
    outp = rp.hash(inp)
    out = {}
    out["rescue_hash"] = timeit(lambda: rp.hash(inp), number=10)
    out["rescue_trace"] = timeit(lambda: rp.trace(inp), number=10)
    for (expansion, tests, security), name in [
        ((4, 2, 2), "small"),
        ((4, 4, 16), "medium"),
        ((8, 8, 32), "large"),
    ]:
        stark = Stark(
            expansion, tests, security, rp.m, rp.N + 1,
            backend=backend, rng=DeterministicRandom(1),
        )
        trace = rp.trace(inp)
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(outp)
        out[f"prove_{name}"] = timeit(
            lambda: stark.prove(trace, air, boundary), repeat=3
        )
        proof = stark.prove(trace, air, boundary)
        if stark.verify(proof, air, boundary):
            out[f"verify_{name}"] = timeit(
                lambda: stark.verify(proof, air, boundary), repeat=3
            )
        else:
            # the reference's (8,8,32) config rejects honest proofs by
            # construction (tq degree 150 > FRI budget 127; see CLAUDE.md) —
            # a "verify" timing of a rejection would be meaningless
            out[f"verify_{name}_rejects_honest_proofs"] = True
        out[f"proof_bytes_{name}"] = len(proof)
    return out


def bench_ntt(max_logn=20):
    """Device NTT sweep (the reference caps at 1024 on one CPU core)."""
    import jax
    import numpy as np

    from stark_tpu.ops.backend import best_plan

    from stark_tpu.utils.profiling import chain_time

    out = {}
    rng = np.random.default_rng(0)
    for logn in range(10, max_logn + 1, 2):
        n = 1 << logn
        plan = best_plan(n)
        a = jax.numpy.asarray(rng.integers(0, 1 << 16, (8, n), dtype=np.uint32))
        # fetch-bracketed data-dependent chains: block_until_ready alone
        # can return before compute finishes on the remote-tunnel backend.
        # chain_time auto-grows the chain so sub-ms transforms aren't
        # measured inside the fetch floor (round-4's 2^16 row was pure
        # rtt noise); the calibration details are published alongside.
        info = {}
        dt = chain_time(plan.forward, a, iters=10, details=info)
        out[f"device_ntt_2e{logn}"] = dt
        out[f"device_ntt_2e{logn}_coeffs_per_s"] = round(n / dt)
        out[f"device_ntt_2e{logn}_timing"] = {
            "iters": info["iters"],
            "fetch_floor_s": round(info["floor_s"], 5),
            "chain_s": round(info["chain_s"], 5),
            "floor_dominated": info["floor_dominated"],
        }
    return out


def bench_sharded(max_logn=16):
    """Mesh-sharded four-step NTT on virtual CPU devices.

    Correctness-scale only: virtual devices share physical cores, so
    these are NOT weak-scaling numbers — they validate the sharded code
    paths end-to-end and report the per-transform cross-chip
    communication volume (which IS exact)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stark_tpu.parallel import ShardedNTT, cpu_mesh

    out = {}
    n = 1 << min(max_logn, 16)
    for d in [1, 2, 4, 8]:
        if len(jax.devices("cpu")) < d:
            out[f"skipped_d{d}"] = "not enough virtual devices (set XLA_FLAGS)"
            continue
        mesh = cpu_mesh(d)
        sntt = ShardedNTT(n, mesh)
        rng = np.random.default_rng(0)
        mat = rng.integers(0, 1 << 16, (8, sntt.R, sntt.C), dtype=np.uint32)
        x = sntt.shard_input(mat)
        jax.block_until_ready(sntt.forward(x))
        dt = timeit(lambda: jax.block_until_ready(sntt.forward(x)), repeat=3)
        out[f"sharded_ntt_2e{n.bit_length()-1}_d{d}"] = dt
        out[f"bytes_per_chip_per_transform_d{d}"] = 32 * n // d
    return out


def bench_models():
    """Model-family grid (no reference counterpart — the Rust crate has
    exactly one scenario): witness + prove + verify wall times for each
    family at host-path sizes, so family-level regressions are visible
    without the TPU flagships."""
    from stark_tpu.models.fibonacci import FibonacciStark
    from stark_tpu.models.mimc import MimcStark
    from stark_tpu.models.rescue_chain import RescueChainStark
    from stark_tpu.models.rescue_stark import RescueStark
    from stark_tpu.rng import DeterministicRandom

    out = {}

    model = RescueStark(rng=DeterministicRandom(1))
    x = FieldElement(5001)
    res = model.prove(x)
    out["rescue_preimage_prove"] = timeit(lambda: model.prove(x), repeat=3)
    out["rescue_preimage_verify"] = timeit(
        lambda: model.verify(*res), repeat=3
    )

    fib = FibonacciStark(1200, rng=DeterministicRandom(2))
    a = b = FieldElement(1)
    fres = fib.prove(a, b)
    out["fibonacci_1200_prove"] = timeit(lambda: fib.prove(a, b), repeat=3)
    out["fibonacci_1200_verify"] = timeit(
        lambda: fib.verify(a, b, *fres), repeat=3
    )

    mimc = MimcStark(1024, rng=DeterministicRandom(3))
    mres = mimc.prove(FieldElement(7))
    out["mimc_1024_prove"] = timeit(
        lambda: mimc.prove(FieldElement(7)), repeat=3
    )
    out["mimc_1024_verify"] = timeit(
        lambda: mimc.verify(FieldElement(7), *mres), repeat=3
    )

    chain = RescueChainStark(64, rng=DeterministicRandom(4))
    out["rescue_chain_64_witness"] = timeit(
        lambda: chain.air.trace(FieldElement(9)), repeat=3
    )
    cres = chain.prove(FieldElement(9))
    out["rescue_chain_64_prove"] = timeit(
        lambda: chain.prove(FieldElement(9)), repeat=3
    )
    out["rescue_chain_64_verify"] = timeit(
        lambda: chain.verify(*cres), repeat=3
    )
    return out


SUITES = {
    "field": bench_field,
    "poly": bench_poly,
    "fri": bench_fri,
    "stark": bench_stark,
    "ntt": bench_ntt,
    "sharded": bench_sharded,
    "models": bench_models,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all", help="comma list or 'all'")
    ap.add_argument("--max-logn", type=int, default=20)
    args = ap.parse_args()

    names = list(SUITES) if args.suite == "all" else args.suite.split(",")
    os.makedirs(RESULTS_DIR, exist_ok=True)
    all_results = {}
    for name in names:
        fn = SUITES[name]
        kwargs = {"max_logn": args.max_logn} if name in ("ntt", "sharded") else {}
        t0 = time.time()
        results = fn(**kwargs)
        results["_suite_wall_s"] = round(time.time() - t0, 1)
        all_results[name] = results
        with open(os.path.join(RESULTS_DIR, f"{name}.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(f"\n## {name}\n")
        print("| benchmark | time |")
        print("|---|---|")
        for k, v in results.items():
            if k.startswith("_"):
                continue
            if isinstance(v, float):
                print(f"| {k} | {_fmt(v)} |")
            else:
                print(f"| {k} | {v} |")
    return all_results


if __name__ == "__main__":
    main()
