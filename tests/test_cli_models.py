"""CLI and flagship-model pipeline tests."""

import json

from stark_tpu.cli import main as cli_main
from stark_tpu.field import FieldElement
from stark_tpu.models.rescue_stark import RescueStark
from stark_tpu.rng import DeterministicRandom


def test_model_prove_verify():
    model = RescueStark(rng=DeterministicRandom(1))
    x = FieldElement(12345)
    output, proof = model.prove(x)
    assert output == model.hash(x)
    assert model.verify(output, proof)
    assert not model.verify(FieldElement(999), proof)
    # malformed bytes are rejected, not raised
    assert not model.verify(output, b"garbage")
    assert not model.verify(output, proof[:-10])


def test_model_prove_batch():
    model = RescueStark(rng=DeterministicRandom(2))
    inputs = [FieldElement(5), FieldElement(6)]
    results = model.prove_batch(inputs)
    assert len(results) == 2
    for x, (output, proof) in zip(inputs, results):
        assert output == model.hash(x)
        assert model.verify(output, proof)


def test_cli_round_trip(tmp_path, capsys):
    proof_file = str(tmp_path / "proof.bin")
    rc = cli_main(
        [
            "prove",
            "--input", "57322816861100832358702415967512842988",
            "--out", proof_file,
            "--seed", "7",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["output"] == "89633745865384635541695204788332415101"

    rc = cli_main(
        ["verify", "--output", out["output"], "--proof", proof_file]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["valid"] is True

    # wrong output fails with nonzero exit
    rc = cli_main(["verify", "--output", "1", "--proof", proof_file])
    assert rc == 1
    assert json.loads(capsys.readouterr().out)["valid"] is False


def test_cli_hash_and_info(capsys):
    assert cli_main(["hash", "--input", "1"]) == 0
    assert (
        capsys.readouterr().out.strip()
        == "244180265933090377212304188905974087294"
    )
    assert cli_main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["prime_formula"] == "1 + 407 * 2^119"


def test_cli_inspect(tmp_path, capsys):
    proof_file = str(tmp_path / "p.bin")
    assert cli_main(["prove", "--input", "5", "--out", proof_file, "--seed", "1"]) == 0
    capsys.readouterr()
    assert cli_main(["inspect", "--proof", proof_file]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["object_kinds"]["merkle_root"] == 9  # 2 bq + randomizer + 6 FRI
    assert out["transcript_objects"] == 90

    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"junk")
    assert cli_main(["inspect", "--proof", bad]) == 1
    assert "malformed" in json.loads(capsys.readouterr().out)["error"]


def test_cli_fibonacci_prove_verify(tmp_path):
    """The fibonacci model family is reachable from the CLI: prove a
    short sequence, verify the honest result, reject a wrong one."""
    import json

    from stark_tpu.cli import main
    from stark_tpu.field import FieldElement
    from stark_tpu.models.fibonacci import FibonacciAir

    proof_file = str(tmp_path / "fib.bin")
    rc = main([
        "prove", "--model", "fibonacci", "--steps", "60",
        "--out", proof_file, "--seed", "5",
    ])
    assert rc == 0
    result = FibonacciAir(60).result(FieldElement(1), FieldElement(1))
    assert main([
        "verify", "--model", "fibonacci", "--steps", "60",
        "--output", str(result.value), "--proof", proof_file,
    ]) == 0
    assert main([
        "verify", "--model", "fibonacci", "--steps", "60",
        "--output", "999", "--proof", proof_file,
    ]) == 1


def test_cli_mimc_prove_verify(tmp_path):
    """The mimc model family is reachable from the CLI: prove a cubing
    chain, verify the honest result, reject a wrong result and a wrong
    seed, and reject cross-model arguments."""
    import json

    import pytest

    from stark_tpu.cli import main
    from stark_tpu.field import FieldElement
    from stark_tpu.models.mimc import MimcAir

    proof_file = str(tmp_path / "mimc.bin")
    rc = main([
        "prove", "--model", "mimc", "--steps", "48", "--input", "3",
        "--out", proof_file, "--seed", "11",
    ])
    assert rc == 0
    result = MimcAir(48).result(FieldElement(3))
    good = ["verify", "--model", "mimc", "--steps", "48", "--input", "3",
            "--output", str(result.value), "--proof", proof_file]
    assert main(good) == 0
    assert main([
        "verify", "--model", "mimc", "--steps", "48", "--input", "3",
        "--output", "999", "--proof", proof_file,
    ]) == 1
    # a different seed is a different statement
    assert main([
        "verify", "--model", "mimc", "--steps", "48", "--input", "4",
        "--output", str(result.value), "--proof", proof_file,
    ]) == 1
    # a different key is a different statement
    assert main(good + ["--key", "17"]) == 1
    # cross-model arguments are rejected, not ignored
    with pytest.raises(SystemExit):
        main([
            "prove", "--model", "mimc", "--steps", "4", "--input", "3",
            "--seed-a", "1", "--out", proof_file,
        ])
    with pytest.raises(SystemExit):
        main([
            "prove", "--model", "rescue", "--key", "17", "--input", "3",
            "--out", proof_file,
        ])
