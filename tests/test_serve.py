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
