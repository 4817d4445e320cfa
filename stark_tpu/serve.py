"""Minimal proving/verification service (stdlib HTTP, JSON API).

The reference is a library with no serving surface (its main.rs is
empty); production proving wants a long-lived process so the compiled
device modules, process-wide statement tables and native libraries are
paid once and amortized across requests.  This module wraps the model
families behind a small JSON API:

    POST /prove   {"model": "rescue"|"fibonacci"|"mimc"|"rescue-chain",
                   ...model params...}
        -> {"proof": hex, "output": [...decimal strings...],
            "proof_bytes": N, "prove_s": t}
    POST /verify  {"model": ..., same params, "proof": hex,
                   "output": [...]}
        -> {"valid": true/false, "verify_s": t}
    GET  /healthz -> {"ok": true, "backend": "...", "models": [...]}

Run:  python -m stark_tpu.serve [--port 8080] [--device]

Design notes:

* one `ThreadingHTTPServer` accepts connections concurrently, but heavy
  work is SINGLE-FLIGHT: one prove (or heavy verify) holds `_work_gate`
  at a time — concurrent heavy JAX computations collapse this machine
  (XLA compile grabs every core), so a second request queues for at most
  ``queue_timeout_s`` and then gets 503 + Retry-After instead of
  starting a second compile;
* statement-size ceilings are justified by measured cost: fibonacci /
  mimc ``steps`` <= 2^16 and rescue-chain ``hashes`` <= 2^12 land on
  the 2^20 FRI domain that proves in single-digit seconds warm
  (BENCHMARKS.md flagship grid); one doubling beyond that is a
  multi-minute cold compile and a multi-GB working set — an easy DoS.
  Ceilings are constructor/CLI-tunable for operators with headroom;
* model instances are cached per (model, statement-shape) in a small
  LRU (the key is client-controlled — an unbounded dict lets a client
  iterating step counts grow memory without bound);
* proofs travel as hex; all field elements as decimal strings (they
  exceed every JSON number range);
* hostile inputs: malformed JSON / unknown models / bad proofs return
  4xx with a reason, never a traceback (the verifier's hardened parser
  raises `MalformedProofData` on crafted bytes); ceiling rejections
  happen BEFORE any model construction or prover work.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Tuple

from .field import FieldElement
from .params import P

#: Default statement-size ceilings (see module docstring for the cost
#: measurements that justify them).
MAX_STEPS = 1 << 16
MAX_CHAIN_HASHES = 1 << 12
#: Bound on distinct cached (model, statement-shape) instances.
MODEL_CACHE_CAP = 8


class ServiceError(Exception):
    def __init__(self, status: int, reason: str) -> None:
        super().__init__(reason)
        self.status = status
        self.reason = reason


def _fe(value, name: str) -> FieldElement:
    try:
        return FieldElement(int(str(value)) % P)
    except (TypeError, ValueError):
        raise ServiceError(400, f"bad field element for {name!r}")


def _int(params: dict, name: str, default=None, lo=1, hi=MAX_STEPS) -> int:
    v = params.get(name, default)
    if v is None:
        raise ServiceError(400, f"missing parameter {name!r}")
    try:
        v = int(v)
    except (TypeError, ValueError):
        raise ServiceError(400, f"parameter {name!r} must be an integer")
    if not lo <= v <= hi:
        raise ServiceError(400, f"parameter {name!r} out of range [{lo},{hi}]")
    return v


class ProverService:
    """Model registry + bounded per-statement-shape instance cache."""

    def __init__(
        self,
        backend=None,
        max_steps: int = MAX_STEPS,
        max_chain_hashes: int = MAX_CHAIN_HASHES,
        queue_timeout_s: float = 30.0,
    ) -> None:
        self.backend = backend
        self.max_steps = max_steps
        self.max_chain_hashes = max_chain_hashes
        self.queue_timeout_s = queue_timeout_s
        self._models: Dict[tuple, object] = {}
        self._models_lock = threading.Lock()
        #: one heavy JAX/prover computation at a time (see module doc)
        self._work_gate = threading.Lock()

    # -- model construction (cached per statement shape) ---------------

    def _model(self, kind: str, params: dict):
        if kind == "rescue":
            key: Tuple = ("rescue",)
        elif kind == "fibonacci":
            key = ("fibonacci", _int(params, "steps", hi=self.max_steps))
        elif kind == "mimc":
            key = ("mimc", _int(params, "steps", hi=self.max_steps))
        elif kind == "rescue-chain":
            key = (
                "rescue-chain",
                _int(params, "hashes", hi=self.max_chain_hashes),
            )
        else:
            raise ServiceError(400, f"unknown model {kind!r}")
        with self._models_lock:
            model = self._models.get(key)
            if model is not None:  # LRU refresh
                self._models.pop(key, None)
                self._models[key] = model
                return model
        # build outside the lock (construction can be slow); worst case
        # two threads build the same model and one wins the insert
        model = self._build(kind, key)
        with self._models_lock:
            existing = self._models.get(key)
            if existing is not None:
                return existing
            while len(self._models) >= MODEL_CACHE_CAP:
                self._models.pop(next(iter(self._models)))
            self._models[key] = model
        return model

    def _build(self, kind: str, key: tuple):
        if kind == "rescue":
            from .models.rescue_stark import RescueStark

            return RescueStark(backend=self.backend)
        if kind == "fibonacci":
            from .models.fibonacci import FibonacciStark

            return FibonacciStark(key[1], backend=self.backend)
        if kind == "mimc":
            from .models.mimc import MimcStark

            return MimcStark(key[1], backend=self.backend)
        from .models.rescue_chain import RescueChainStark

        return RescueChainStark(key[1], backend=self.backend)

    # -- API operations -------------------------------------------------

    def _acquire_work_gate(self):
        """Admission control: wait up to ``queue_timeout_s`` for the
        single-flight gate, else tell the client to retry later.  Two
        concurrent heavy JAX computations collapse this host (XLA
        compile takes every core), so queuing + 503 beats starting."""
        if not self._work_gate.acquire(timeout=self.queue_timeout_s):
            raise ServiceError(
                503, "prover busy; retry later (single-flight admission)"
            )

    def prove(self, req: dict) -> dict:
        kind = req.get("model", "rescue")
        model = self._model(kind, req)  # ceilings enforced HERE, pre-gate
        self._acquire_work_gate()
        try:
            return self._prove_locked(kind, req, model)
        finally:
            self._work_gate.release()

    def _prove_locked(self, kind: str, req: dict, model) -> dict:
        t0 = time.perf_counter()
        if kind == "rescue":
            output, proof = model.prove(_fe(req.get("input"), "input"))
            out_vals = [str(output.value)]
        elif kind == "fibonacci":
            a = _fe(req.get("a", 1), "a")
            b = _fe(req.get("b", 1), "b")
            result, proof = model.prove(a, b)
            out_vals = [str(result.value)]
        elif kind == "mimc":
            output, proof = model.prove(_fe(req.get("input"), "input"))
            out_vals = [str(output.value)]
        else:  # rescue-chain
            output, proof = model.prove(_fe(req.get("input"), "input"))
            out_vals = [str(output.value)]
        return {
            "proof": proof.hex(),
            "output": out_vals,
            "proof_bytes": len(proof),
            "prove_s": round(time.perf_counter() - t0, 4),
        }

    def verify(self, req: dict) -> dict:
        kind = req.get("model", "rescue")
        model = self._model(kind, req)
        try:
            proof = bytes.fromhex(req.get("proof", ""))
        except ValueError:
            raise ServiceError(400, "proof must be hex")
        if not proof:
            raise ServiceError(400, "missing proof")
        outputs = req.get("output")
        if not isinstance(outputs, list) or not outputs:
            raise ServiceError(400, "missing output list")
        self._acquire_work_gate()
        try:
            return self._verify_locked(kind, req, model, proof, outputs)
        finally:
            self._work_gate.release()

    def _verify_locked(
        self, kind: str, req: dict, model, proof: bytes, outputs: list
    ) -> dict:
        t0 = time.perf_counter()
        if kind == "fibonacci":
            a = _fe(req.get("a", 1), "a")
            b = _fe(req.get("b", 1), "b")
            valid = model.verify(a, b, _fe(outputs[0], "output"), proof)
        elif kind == "mimc":
            valid = model.verify(
                _fe(req.get("input"), "input"),
                _fe(outputs[0], "output"),
                proof,
            )
        else:
            valid = model.verify(_fe(outputs[0], "output"), proof)
        return {
            "valid": bool(valid),
            "verify_s": round(time.perf_counter() - t0, 4),
        }

    def health(self) -> dict:
        import jax

        return {
            "ok": True,
            "backend": (
                "host" if self.backend is None else jax.default_backend()
            ),
            "models": ["rescue", "fibonacci", "mimc", "rescue-chain"],
        }


def make_server(service: ProverService, host: str, port: int):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if status == 503:
                self.send_header(
                    "Retry-After", str(int(service.queue_timeout_s) or 1)
                )
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through our logger
            from .utils import get_logger

            get_logger("stark_tpu.serve").info(fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, service.health())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > 64 << 20:
                    raise ServiceError(413, "request too large")
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    raise ServiceError(400, "malformed JSON")
                if not isinstance(req, dict):
                    raise ServiceError(400, "request must be an object")
                if self.path == "/prove":
                    self._send(200, service.prove(req))
                elif self.path == "/verify":
                    self._send(200, service.verify(req))
                else:
                    raise ServiceError(404, "not found")
            except ServiceError as e:
                self._send(e.status, {"error": e.reason})
            except Exception as e:  # noqa: BLE001 — no tracebacks to clients
                from .utils import get_logger

                get_logger("stark_tpu.serve").exception("request failed")
                self._send(500, {"error": type(e).__name__})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="stark_tpu proving service")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--device", action="store_true",
        help="attach the JAX/TPU backend (default: host golden path)",
    )
    ap.add_argument(
        "--max-steps", type=int, default=MAX_STEPS,
        help="fibonacci/mimc statement-size ceiling (default 2^16)",
    )
    ap.add_argument(
        "--max-chain-hashes", type=int, default=MAX_CHAIN_HASHES,
        help="rescue-chain statement-size ceiling (default 2^12)",
    )
    ap.add_argument(
        "--queue-timeout", type=float, default=30.0,
        help="seconds a request may wait for the single-flight prover "
             "gate before 503 (default 30)",
    )
    args = ap.parse_args(argv)
    backend = None
    if args.device:
        from .ops.backend import JaxBackend

        backend = JaxBackend()
    service = ProverService(
        backend,
        max_steps=args.max_steps,
        max_chain_hashes=args.max_chain_hashes,
        queue_timeout_s=args.queue_timeout,
    )
    server = make_server(service, args.host, args.port)
    print(f"stark_tpu serving on {args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
