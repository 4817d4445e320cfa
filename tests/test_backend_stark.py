"""The device backend must be a pure performance seam: proofs produced with
JaxBackend attached are byte-identical to host-only proofs."""

from stark_tpu.field import FieldElement
from stark_tpu.ops.backend import JaxBackend
from stark_tpu.rescue_prime import RescuePrime
from stark_tpu.rng import DeterministicRandom
from stark_tpu.stark import Stark


def test_backend_proof_bytes_identical():
    rp = RescuePrime()
    input_element = FieldElement.sample(b"0xdeadbeef")
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    boundary = rp.boundary_constraints(output_element)

    host_stark = Stark(4, 2, 2, rp.m, rp.N + 1, rng=DeterministicRandom(9))
    air = rp.transition_constraints(host_stark.omicron)
    host_proof = host_stark.prove(trace, air, boundary)

    dev_stark = Stark(
        4, 2, 2, rp.m, rp.N + 1, backend=JaxBackend(), rng=DeterministicRandom(9)
    )
    dev_proof = dev_stark.prove(trace, air, boundary)

    assert dev_proof == host_proof
    # cross-verification both ways
    assert host_stark.verify(dev_proof, air, boundary)
    assert dev_stark.verify(host_proof, air, boundary)


def test_backend_fri_fold_dispatch():
    """Fri._fold dispatches to the backend at >=256 and stays bit-equal."""
    import random

    from stark_tpu.fri import Fri
    from stark_tpu.params import P

    n = 512
    omega = FieldElement.primitive_nth_root(n)
    g = FieldElement.generator()
    rng = random.Random(11)
    codeword = [rng.randrange(P) for _ in range(n)]
    alpha = rng.randrange(P)

    host_fri = Fri(g, omega, n, 4, 2)
    dev_fri = Fri(g, omega, n, 4, 2, backend=JaxBackend())
    assert dev_fri._fold(codeword, alpha, g.value, omega.value) == host_fri._fold(
        codeword, alpha, g.value, omega.value
    )


def test_backend_poly_multiply_matches_host():
    import random

    from stark_tpu.ntt import poly_multiply
    from stark_tpu.params import P

    rng = random.Random(21)
    backend = JaxBackend()
    for la, lb in [(1, 1), (40, 17), (5000, 5000)]:
        a = [rng.randrange(P) for _ in range(la)]
        b = [rng.randrange(P) for _ in range(lb)]
        assert backend.poly_multiply(a, b) == poly_multiply(a, b)
    assert backend.poly_multiply([], [1]) == []


def test_backend_rs_extend_restrict_round_trip():
    """Device Reed-Solomon extension/restriction above the device-size
    floor (8192) round-trips and matches the host NTT exactly."""
    import random

    from stark_tpu.ntt import NTT
    from stark_tpu.params import GENERATOR, P

    rng = random.Random(31)
    backend = JaxBackend()
    n = 8192
    coeffs = [rng.randrange(P) for _ in range(n // 4)]
    ext = backend.rs_extend(coeffs, n, GENERATOR)
    assert ext == NTT(n).coset_evaluate(coeffs, GENERATOR)
    back = backend.rs_restrict(ext, GENERATOR)
    assert back[: len(coeffs)] == coeffs
    assert all(c == 0 for c in back[len(coeffs):])
