"""Count blocking host<->device crossings in one device prove.

Each ``jax.device_get`` is a blocking fetch (~30 ms of tunnel round
trip on this machine's remote TPU); the device prover's optimization
story this round was driving the count down (~40 at round-2 start).
This probe instruments ``jax.device_get``, runs a Fibonacci device
prove twice (warm-up, then counted), and prints one JSON line with the
call count and per-site breakdown.

Run on CPU (works anywhere):  python benches/crossings_probe.py
"""

import json
import sys
import time
import traceback
from collections import Counter

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

calls = []
_orig = jax.device_get


def _counting(x):
    fr = traceback.extract_stack(limit=3)[0]
    calls.append(f"{fr.filename.split('/')[-1]}:{fr.lineno}")
    return _orig(x)


jax.device_get = _counting

from stark_tpu.field import FieldElement  # noqa: E402
from stark_tpu.models.fibonacci import FibonacciStark  # noqa: E402
from stark_tpu.ops.backend import JaxBackend  # noqa: E402
from stark_tpu.rng import DeterministicRandom  # noqa: E402


def main(log_steps: int = 10) -> None:
    model = FibonacciStark(
        1 << log_steps, backend=JaxBackend(), rng=DeterministicRandom(7)
    )
    a = b = FieldElement(1)
    assert model.stark._use_device_pipeline()
    model.prove(a, b)  # warm-up: compiles + per-config table caches
    calls.clear()
    t0 = time.time()
    result, proof = model.prove(a, b)
    dt = time.time() - t0
    assert model.verify(a, b, result, proof)
    print(json.dumps({
        "metric": "blocking_device_fetches_per_prove",
        "value": len(calls),
        "unit": "device_get calls",
        "steps": 1 << log_steps,
        "fri_domain": model.stark.fri_domain_length,
        "prove_s_cpu": round(dt, 2),
        "sites": dict(Counter(calls)),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
