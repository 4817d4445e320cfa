"""Attribute the flagship prove's host tail (round-5 brief item 1).

Round 4 left `openings` + `randomizer_poly` as 69% of the chain-4096
prove and 42% of fib-2^16 without saying WHERE inside them the time
goes.  This bench runs the flagship proves on the real TPU with the
sub-stage timers added in round 5 (stark.py regions
``openings/gather_dispatch|fetch|serialize`` and
``randomizer_poly/draw|pack|extend|tree``) and records the split.

Usage:  python benches/prove_attribution.py [fib|chain|both]
Writes: benches/results/prove_attribution.json
"""

import json
import os
import sys
import time

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def mark(msg):
    print(f"[attr +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.time()

# stack dumps on demand (kill -USR1 <pid>) — the tunnel makes long
# silent compiles normal, and a dump beats guessing where it's stuck
import faulthandler  # noqa: E402
import signal  # noqa: E402

faulthandler.register(signal.SIGUSR1, all_threads=True)


def run_fib():
    from bench import _bench_fibonacci_large, _fib_model, _precompile_model

    model = _fib_model()
    _precompile_model(model, model._constraints, "fib")
    mark("fib precompile done")
    prove_s, verify_s, domain, stages = _bench_fibonacci_large(model)
    mark(f"fib prove {prove_s:.3f}s")
    return {
        "prove_s": round(prove_s, 3),
        "verify_s": round(verify_s, 3),
        "fri_domain": domain,
        "stages_s": stages,
    }


def run_chain():
    from bench import _bench_chain_large, _chain_model, _precompile_model

    model = _chain_model()
    _precompile_model(model, model.constraints, "chain")
    mark("chain precompile done")
    witness_s, prove_s, verify_s, nbytes, stages = _bench_chain_large(model)
    mark(f"chain prove {prove_s:.3f}s")
    return {
        "witness_s": round(witness_s, 3),
        "prove_s": round(prove_s, 3),
        "verify_s": round(verify_s, 3),
        "proof_bytes": nbytes,
        "stages_s": stages,
    }


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {"backend": jax.default_backend()}
    if what in ("fib", "both"):
        out["fibonacci_2e16"] = run_fib()
    if what in ("chain", "both"):
        out["rescue_chain_4096"] = run_chain()
    path = os.path.join(_REPO, "benches", "results",
                        "prove_attribution.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
