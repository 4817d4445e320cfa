"""Proving service (stark_tpu.serve): JSON API round trips and hostile
inputs, against a live in-process server."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from stark_tpu.serve import ProverService, make_server


@pytest.fixture(scope="module")
def server_url():
    server = make_server(ProverService(), "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _post_raw(url, path, body: bytes):
    req = urllib.request.Request(
        url + path, data=body, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        data = json.loads(r.read())
    assert data["ok"] is True
    assert "rescue" in data["models"]


def test_prove_verify_round_trip(server_url):
    status, proved = _post(
        server_url, "/prove", {"model": "rescue", "input": "12345"}
    )
    assert status == 200
    assert proved["proof_bytes"] > 1000
    status, verdict = _post(
        server_url,
        "/verify",
        {"model": "rescue", "proof": proved["proof"],
         "output": proved["output"]},
    )
    assert status == 200 and verdict["valid"] is True

    # wrong claimed output -> valid: false (not an error)
    status, verdict = _post(
        server_url,
        "/verify",
        {"model": "rescue", "proof": proved["proof"], "output": ["999"]},
    )
    assert status == 200 and verdict["valid"] is False


def test_fibonacci_model(server_url):
    status, proved = _post(
        server_url, "/prove",
        {"model": "fibonacci", "steps": 64, "a": "1", "b": "1"},
    )
    assert status == 200
    status, verdict = _post(
        server_url, "/verify",
        {"model": "fibonacci", "steps": 64, "a": "1", "b": "1",
         "proof": proved["proof"], "output": proved["output"]},
    )
    assert status == 200 and verdict["valid"] is True


def test_hostile_inputs(server_url):
    code, body = _post_raw(server_url, "/prove", b"{not json")
    assert code == 400 and "error" in body

    code, body = _post_raw(
        server_url, "/prove", json.dumps({"model": "nope"}).encode()
    )
    assert code == 400

    code, body = _post_raw(
        server_url, "/verify",
        json.dumps({"model": "rescue", "proof": "zz", "output": ["1"]}).encode(),
    )
    assert code == 400

    # truncated/garbage proof bytes -> clean invalid, not a traceback
    code, body = _post_raw(
        server_url, "/verify",
        json.dumps(
            {"model": "rescue", "proof": "00" * 64, "output": ["1"]}
        ).encode(),
    )
    assert code == 200 and body["valid"] is False

    code, body = _post_raw(
        server_url, "/prove",
        json.dumps({"model": "fibonacci", "steps": -4}).encode(),
    )
    assert code == 400


def test_oversized_statement_rejected_before_prover(server_url):
    # steps above the ceiling must 400 without constructing a model or
    # touching the prover (resource hardening, not just parsing)
    code, body = _post_raw(
        server_url, "/prove",
        json.dumps({"model": "fibonacci", "steps": 1 << 20}).encode(),
    )
    assert code == 400 and "out of range" in body["error"]

    code, body = _post_raw(
        server_url, "/prove",
        json.dumps({"model": "rescue-chain", "hashes": 1 << 13}).encode(),
    )
    assert code == 400 and "out of range" in body["error"]


def test_oversized_statement_skips_model_construction():
    svc = ProverService()
    calls = []
    svc._build = lambda kind, key: calls.append(key)  # would record any build
    with pytest.raises(Exception) as e:
        svc.prove({"model": "fibonacci", "steps": 1 << 20})
    assert getattr(e.value, "status", None) == 400
    assert calls == [] and svc._models == {}


def test_single_flight_gate_503_when_busy(server_url_factory=None):
    # a held work gate makes the next request queue, then 503 with
    # Retry-After — it must NOT start a second heavy computation
    svc = ProverService(queue_timeout_s=0.2)
    server = make_server(svc, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        svc._work_gate.acquire()
        try:
            req = urllib.request.Request(
                url + "/prove",
                data=json.dumps({"model": "rescue", "input": "1"}).encode(),
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    code, headers = resp.status, resp.headers
            except urllib.error.HTTPError as e:
                code, headers = e.code, e.headers
            assert code == 503
            assert headers.get("Retry-After")
        finally:
            svc._work_gate.release()
        # gate released -> same request succeeds
        status, proved = _post(url, "/prove", {"model": "rescue", "input": "1"})
        assert status == 200 and proved["proof_bytes"] > 1000
    finally:
        server.shutdown()


def test_model_cache_bounded():
    from stark_tpu.serve import MODEL_CACHE_CAP

    svc = ProverService()
    svc._build = lambda kind, key: object()  # skip real construction
    for i in range(MODEL_CACHE_CAP * 3):
        svc._model("fibonacci", {"steps": i + 1})
    assert len(svc._models) <= MODEL_CACHE_CAP
    # LRU: most recent keys survive
    assert ("fibonacci", MODEL_CACHE_CAP * 3) in svc._models
