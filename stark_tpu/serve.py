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

* one `ThreadingHTTPServer`; proving is CPU/TPU-bound and the process-
  wide caches are thread-safe-by-idempotence (worst case a table is
  computed twice), so concurrent requests are safe;
* model instances are cached per (model, statement-shape) so repeat
  statements reuse trace-independent tables and compiled modules;
* proofs travel as hex; all field elements as decimal strings (they
  exceed every JSON number range);
* hostile inputs: malformed JSON / unknown models / bad proofs return
  4xx with a reason, never a traceback (the verifier's hardened parser
  raises `MalformedProofData` on crafted bytes).
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Tuple

from .field import FieldElement
from .params import P


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


def _int(params: dict, name: str, default=None, lo=1, hi=1 << 24) -> int:
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
    """Model registry + per-statement-shape instance cache."""

    def __init__(self, backend=None) -> None:
        self.backend = backend
        self._models: Dict[tuple, object] = {}

    # -- model construction (cached per statement shape) ---------------

    def _model(self, kind: str, params: dict):
        if kind == "rescue":
            key: Tuple = ("rescue",)
        elif kind == "fibonacci":
            key = ("fibonacci", _int(params, "steps"))
        elif kind == "mimc":
            key = ("mimc", _int(params, "steps"))
        elif kind == "rescue-chain":
            key = ("rescue-chain", _int(params, "hashes", hi=1 << 16))
        else:
            raise ServiceError(400, f"unknown model {kind!r}")
        model = self._models.get(key)
        if model is None:
            model = self._models[key] = self._build(kind, key)
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

    def prove(self, req: dict) -> dict:
        kind = req.get("model", "rescue")
        model = self._model(kind, req)
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
    args = ap.parse_args(argv)
    backend = None
    if args.device:
        from .ops.backend import JaxBackend

        backend = JaxBackend()
    server = make_server(ProverService(backend), args.host, args.port)
    print(f"stark_tpu serving on {args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
