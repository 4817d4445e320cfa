"""Multi-process (multi-host-shaped) mesh run: 2 processes x 4 CPU
devices over jax.distributed.

Exercises the one comm-backend piece a single-process mesh cannot:
process bring-up via ``stark_tpu.parallel.mesh.init_distributed``
(jax.distributed.initialize) and collectives over a mesh that SPANS
processes — the DCN-shaped path of SURVEY §2(e).  Within one machine the
"DCN" is loopback, but the controller topology (two controllers, each
addressing only its local devices, all_to_all crossing the process
boundary) is exactly the multi-host one.

Checks, per process:

1. sharded four-step NTT at 2^16 over the 2x4-process-spanning mesh,
   bit-identical to the host NTT (full-array compare after a
   process_allgather);
2. the four-step layout round trip (forward -> inverse_from_fourstep);
3. a data-parallel Rescue STARK prove batch sharded across the global
   mesh's processes: each process proves its slice, roots cross-checked.

Usage:
    python benches/multiprocess_mesh.py            # spawns the workers
    python benches/multiprocess_mesh.py --worker I # internal

Writes benches/results/multiprocess_mesh.json on success.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("STARK_TPU_MP_PORT", "52123"))
NPROC = 2
LOCAL_DEVICES = 4
LOG_N = int(os.environ.get("STARK_TPU_MP_LOGN", "16"))


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from stark_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == NPROC * LOCAL_DEVICES, n_dev

    import hashlib

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from stark_tpu.field import FieldElement
    from stark_tpu.ntt import NTT
    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops.limbs import pack, unpack
    from stark_tpu.params import P, R_MOD_P
    from stark_tpu.parallel.mesh import make_mesh
    from stark_tpu.parallel.ntt_sharded import ShardedNTT

    def _unmont(arr):
        return unpack(
            np.asarray(jax.device_get(fo.from_mont(jnp.asarray(arr))))
        )

    mesh = make_mesh()  # all 8 global devices, spanning both processes
    n = 1 << LOG_N
    sh = ShardedNTT(n, mesh)

    rng = np.random.default_rng(42)
    vals = [int(v) % P for v in rng.integers(0, 1 << 62, n)]

    # --- 1. forward NTT over the process-spanning mesh, bit-identical --
    mat = sh.to_matrix(pack([v * R_MOD_P % P for v in vals]))
    x = jax.make_array_from_callback(
        mat.shape, sh.col_sharded, lambda idx: mat[idx]
    )
    t0 = time.time()
    out = sh.forward(x)
    full = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    dt = time.time() - t0
    got = _unmont(sh.from_output_matrix(full))
    want = NTT(n).forward(list(vals))
    assert got == want, "sharded forward mismatch vs host NTT"

    # --- 2. round trip through the layout inverse ----------------------
    back = sh.inverse_from_fourstep(out)
    full_back = np.asarray(
        multihost_utils.process_allgather(back, tiled=True)
    ).reshape(8, n)
    assert _unmont(full_back) == vals, "four-step round trip mismatch"

    # --- 3. data-parallel proving across the processes ------------------
    # Full codeword-sharded proving multi-process needs process-local
    # host crossings (single-process meshes cover that path; see
    # tests/test_sharded_stark.py); the dp axis IS multi-process clean:
    # each process proves its own statements, digests cross-checked.
    from stark_tpu.models.rescue_stark import RescueStark
    from stark_tpu.rng import DeterministicRandom

    model = RescueStark(rng=DeterministicRandom(7 + pid))
    output, proof = model.prove(FieldElement(1000 + pid))
    assert model.verify(output, proof)

    # --- 4. FULL sharded STARK prove across the process boundary --------
    # The last untested composition of SURVEY §2(e) with §1 L5: the
    # codeword-sharded prover (ShardedBackend -> four-step NTT,
    # distributed Merkle, sharded folds, sharded combination) running
    # over the 2-controller mesh, byte-identical to the host proof.
    # Every controller runs the same prover program in lockstep; host
    # crossings reassemble via process_allgather
    # (stark_tpu.parallel.mesh.global_device_get).
    from stark_tpu.models.fibonacci import FibonacciStark
    from stark_tpu.parallel import ShardedBackend

    steps = 120  # 2048-point FRI domain (the dryrun scenario)
    fa, fb = FieldElement(1), FieldElement(1)
    host_fib = FibonacciStark(steps, rng=DeterministicRandom(9))
    fib_result, host_proof = host_fib.prove(fa, fb)
    sharded_fib = FibonacciStark(
        steps,
        backend=ShardedBackend(mesh, device_prover_min=2048),
        rng=DeterministicRandom(9),
    )
    assert sharded_fib.stark._use_device_pipeline()
    t_sh = time.time()
    fib_result2, sharded_proof = sharded_fib.prove(fa, fb)
    sharded_prove_s = time.time() - t_sh
    assert fib_result2 == fib_result
    assert sharded_proof == host_proof, (
        "multiprocess sharded STARK proof != host proof"
    )
    assert sharded_fib.verify(fa, fb, fib_result2, sharded_proof)
    # cross-check both controllers produced identical bytes
    sh_digest = hashlib.sha256(sharded_proof).digest()
    sh_digs = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray(np.frombuffer(sh_digest, dtype=np.uint8)),
            tiled=False,
        )
    )
    assert all(
        bytes(d) == sh_digest for d in sh_digs
    ), "controllers disagree on sharded proof bytes"

    digest = hashlib.sha256(proof).digest()
    digs = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray(np.frombuffer(digest, dtype=np.uint8)), tiled=False
        )
    )
    assert digs.shape[0] == NPROC

    if pid == 0:
        result = {
            "processes": NPROC,
            "devices": n_dev,
            "ntt_n": n,
            "ntt_bit_identical": True,
            "fourstep_round_trip": True,
            "dp_proof_digests": [bytes(d).hex()[:16] for d in digs],
            "sharded_proof_identical": True,
            "sharded_fib_steps": steps,
            "sharded_fri_domain": sharded_fib.stark.fri_domain_length,
            "sharded_prove_s": round(sharded_prove_s, 3),
            "wall_s_forward": round(dt, 3),
        }
        out_path = os.environ.get(
            "STARK_TPU_MP_OUT",
            os.path.join(REPO, "benches", "results", "multiprocess_mesh.json"),
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print("MULTIPROCESS_OK", json.dumps(result))


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # this machine's sitecustomize force-registers the TPU ("axon")
    # backend — which initializes XLA before jax.distributed.initialize
    # can run; drop its trigger so the workers get a clean CPU jax
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            env=env,
        )
        for i in range(NPROC)
    ]
    rc = [p.wait(timeout=900) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")
    print("all workers OK")


if __name__ == "__main__":
    main()
