"""Device-resident Blake2b-256 Merkle commitment.

The prover's commitment step was the dominant cost of TPU-scale proving:
committing a 2^20-element codeword meant fetching a 16 MB digit matrix
to the host (measured ~10 MB/s through this machine's TPU tunnel:
1.2-1.8 s) and hashing 2M small inputs in C (1.4+ s) — 3-6 s per tree,
several trees per proof (benches/merkle_cost_split.py).

This module hashes the tree ON the device instead.  Blake2b-256 is pure
64-bit add/xor/rotate; on a TPU without a 64-bit integer datapath each
u64 word is an explicit (lo, hi) pair of uint32 lanes (adds propagate
one carry; the four rotation amounts 32/24/16/63 are cheap u32
shift/or pairs — rotr32 is a free word swap).  A whole batch of
single-block hashes is one unrolled 12-round compression over (w,)-wide
vectors, so leaf hashing and every tree level are full-width VPU work:

* leaves: ``bincode(FieldElement)`` (sign u32, digit-count u64, base-2^32
  digits — reference fri.rs:119, stark.rs:302, serialization.py) is at
  most 28 bytes, a single Blake2b block whose message words come
  straight from the codeword's plain-form digit pairs; the per-leaf
  byte length ``t = 12 + 4*k`` is the only data-dependent part;
* interior nodes: H(left || right) of 32-byte digests — 64-byte single
  blocks built by even/odd column slicing of the child level.

The full tree for one codeword is ONE jitted dispatch (leaf digests plus
all levels down to a 1024-wide tail); the host sees 32 KB of tail, and
the upper levels stay on the device for query openings, which are
batched gathers (``prefetch``) fetched once per tree.

Trees are byte-identical to :class:`stark_tpu.merkle.MerkleTree` over
the same codeword (reference semantics merkle.rs:17-51); pinned by
tests/test_device_merkle.py against hashlib on CPU.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hashing import merkle_level
from ..params import NUM_LIMBS
from . import field_ops as fo

# Blake2b IV and the parameter-block word for an unkeyed 32-byte digest
# (digest_length=32, fanout=1, depth=1): h[0] = IV[0] ^ 0x01010020.
_IV = (
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
)
_H0 = _IV[0] ^ 0x01010020

_SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)

#: tree levels at or below this width are fetched and finished on the
#: host (32 KB at 1024) — gathers over tiny levels aren't worth dispatches
TAIL_WIDTH = 1024

#: smallest codeword the device tree is used for (below this the digit
#: fetch is cheap and the host native-C path wins on latency)
DEVICE_TREE_MIN = 8192

_ZERO = 0  # sentinel for all-zero message words (their adds are skipped)


def _c(x):
    """u64 constant as a (lo, hi) pair of PYTHON ints: they fold into
    the array ops as immediates, so a compress traced inside a Pallas
    kernel captures no jnp constants (Mosaic rejects captured arrays).
    The int/array mixed cases below keep exact u32 wrap semantics."""
    return (x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF)


def _is_int(x) -> bool:
    return isinstance(x, (int, np.integer))


def _u32(x):
    """Coerce a Python-int half to a typed u32 scalar for array ops
    (a bare int >= 2^31 overflows jax's weak-int32 scalar path)."""
    return np.uint32(x) if _is_int(x) else x


def _add(a, b):
    if _is_int(a[0]) and _is_int(b[0]):
        s = int(a[0]) + int(b[0])
        return s & 0xFFFFFFFF, (int(a[1]) + int(b[1]) + (s >> 32)) & 0xFFFFFFFF
    a = (_u32(a[0]), _u32(a[1]))
    b = (_u32(b[0]), _u32(b[1]))
    lo = a[0] + b[0]
    carry = (lo < b[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def _add3(a, b, x):
    s = _add(a, b)
    if x is _ZERO:
        return s
    return _add(s, x)


def _xor(a, b):
    if _is_int(a[0]) and _is_int(b[0]):
        return int(a[0]) ^ int(b[0]), int(a[1]) ^ int(b[1])
    return _u32(a[0]) ^ _u32(b[0]), _u32(a[1]) ^ _u32(b[1])


def _rotr32(a):
    return a[1], a[0]


def _rotr24(a):
    lo, hi = a
    if _is_int(lo) and _is_int(hi):
        return (
            ((lo >> 24) | (hi << 8)) & 0xFFFFFFFF,
            ((hi >> 24) | (lo << 8)) & 0xFFFFFFFF,
        )
    return (lo >> 24) | (hi << 8), (hi >> 24) | (lo << 8)


def _rotr16(a):
    lo, hi = a
    if _is_int(lo) and _is_int(hi):
        return (
            ((lo >> 16) | (hi << 16)) & 0xFFFFFFFF,
            ((hi >> 16) | (lo << 16)) & 0xFFFFFFFF,
        )
    return (lo >> 16) | (hi << 16), (hi >> 16) | (lo << 16)


def _rotr63(a):
    lo, hi = a
    if _is_int(lo) and _is_int(hi):
        return (
            ((lo << 1) | (hi >> 31)) & 0xFFFFFFFF,
            ((hi << 1) | (lo >> 31)) & 0xFFFFFFFF,
        )
    return (lo << 1) | (hi >> 31), (hi << 1) | (lo >> 31)


def _g(v, a, b, c, d, x, y, fence=False):
    v[a] = _add3(v[a], v[b], x)
    v[d] = _rotr32(_xor(v[d], v[a]))
    v[c] = _add(v[c], v[d])
    v[b] = _rotr24(_xor(v[b], v[c]))
    v[a] = _add3(v[a], v[b], y)
    v[d] = _rotr16(_xor(v[d], v[a]))
    v[c] = _add(v[c], v[d])
    v[b] = _rotr63(_xor(v[b], v[c]))
    if fence:
        fa, fb, fc, fd = jax.lax.optimization_barrier(
            (v[a], v[b], v[c], v[d])
        )
        v[a], v[b], v[c], v[d] = fa, fb, fc, fd


# SIGMA with the message PRE-permuted per round: rows 10, 11 reuse 0, 1.
_SIGMA_FULL = np.asarray(
    [_SIGMA[r % 10] for r in range(12)], dtype=np.int32
)


def blake2b256_single_block(m, t, unroll=None, sigma=None, rounds=12):
    """Vectorized single-final-block Blake2b-256.

    ``m``: 16 message words, each a (lo, hi) pair of (w,) uint32 arrays
    or the ``_ZERO`` sentinel; ``t``: total byte length — a (w,) uint32
    array or a python int.  Returns 8 (w,) uint32 arrays: the 32-byte
    digests as interleaved lo/hi words of h[0..3] (little-endian bytes).

    Two round schedules:

    * ``unroll=False`` (default EVERYWHERE): a ``lax.fori_loop`` whose
      body is ONE round, message words gathered through the SIGMA
      table.  On XLA:CPU a fully unrolled compress makes compile time
      explode superlinearly past ~2 rounds; on the TPU the rolled form
      measured BOTH 21x faster to compile AND 1.6x faster at runtime
      (2^20 tree: 22.5 s compile / 844 ms vs 481 s / 1329 ms unrolled —
      benches/tree_compile_experiment.py).  The round-2 fear about
      per-round message gathers was wrong on this hardware.
    * ``unroll=True`` (opt-in via STARK_TPU_MERKLE_UNROLL=1): rounds
      unrolled at trace time with the SIGMA permutation applied
      statically; kept for A/B measurement.

    ``rounds`` < 12 is for roofline probes ONLY (not a valid hash): the
    marginal cost per round separates compress arithmetic from kernel
    launch/IO in benches/merkle_roofline.py.
    """
    if unroll is None:
        env = os.environ.get("STARK_TPU_MERKLE_UNROLL")
        if env is not None:
            unroll = env != "0"
        else:
            unroll = False
    shape = None
    for word in m:
        if word is not _ZERO:
            cand = jnp.broadcast_shapes(
                jnp.shape(word[0]), jnp.shape(word[1])
            )
            shape = cand if shape is None else jnp.broadcast_shapes(shape, cand)

    h = [_c(_H0)] + [_c(w) for w in _IV[1:]]
    v = list(h) + [_c(w) for w in _IV]
    tlo = t if not isinstance(t, int) else np.uint32(t)
    v[12] = (_u32(v[12][0]) ^ tlo, v[12][1])
    # final-block flag f0 = ~0 (mask keeps Python-int constants in u32;
    # u32 arrays already wrap)
    v[14] = tuple(
        (~h_ & 0xFFFFFFFF) if _is_int(h_) else ~h_ for h_ in v[14]
    )

    if unroll:
        vv = list(v)
        for r in range(rounds):
            sig = _SIGMA_FULL[r]
            mm = [m[sig[j]] for j in range(16)]
            _g(vv, 0, 4, 8, 12, mm[0], mm[1])
            _g(vv, 1, 5, 9, 13, mm[2], mm[3])
            _g(vv, 2, 6, 10, 14, mm[4], mm[5])
            _g(vv, 3, 7, 11, 15, mm[6], mm[7])
            _g(vv, 0, 5, 10, 15, mm[8], mm[9])
            _g(vv, 1, 6, 11, 12, mm[10], mm[11])
            _g(vv, 2, 7, 8, 13, mm[12], mm[13])
            _g(vv, 3, 4, 9, 14, mm[14], mm[15])
        final = [(vv[i][0], vv[i][1]) for i in range(16)]
    else:
        # materialize message words (zeros included) as one (16, 2, w)
        # array the loop body can gather from
        zero = jnp.zeros(shape, dtype=jnp.uint32)
        rows = []
        for word in m:
            if word is _ZERO:
                rows.append(jnp.stack([zero, zero]))
            else:
                rows.append(
                    jnp.stack([
                        jnp.broadcast_to(
                            jnp.asarray(word[0], jnp.uint32), shape
                        ),
                        jnp.broadcast_to(
                            jnp.asarray(word[1], jnp.uint32), shape
                        ),
                    ])
                )
        m_arr = jnp.stack(rows)  # (16, 2, w)
        if sigma is None:
            sigma = jnp.asarray(_SIGMA_FULL)
        v_arr = jnp.stack([
            jnp.stack([
                jnp.broadcast_to(jnp.asarray(p[0], jnp.uint32), shape),
                jnp.broadcast_to(jnp.asarray(p[1], jnp.uint32), shape),
            ])
            for p in v
        ])  # (16, 2, w)

        def round_body(r, acc):
            sel = m_arr[sigma[r]]  # (16, 2, w) — this round's message order
            vv = [(acc[i, 0], acc[i, 1]) for i in range(16)]
            mm = [(sel[j, 0], sel[j, 1]) for j in range(16)]
            _g(vv, 0, 4, 8, 12, mm[0], mm[1])
            _g(vv, 1, 5, 9, 13, mm[2], mm[3])
            _g(vv, 2, 6, 10, 14, mm[4], mm[5])
            _g(vv, 3, 7, 11, 15, mm[6], mm[7])
            _g(vv, 0, 5, 10, 15, mm[8], mm[9])
            _g(vv, 1, 6, 11, 12, mm[10], mm[11])
            _g(vv, 2, 7, 8, 13, mm[12], mm[13])
            _g(vv, 3, 4, 9, 14, mm[14], mm[15])
            return jnp.stack([jnp.stack([p[0], p[1]]) for p in vv])

        v_arr = jax.lax.fori_loop(0, rounds, round_body, v_arr)
        final = [(v_arr[i, 0], v_arr[i, 1]) for i in range(16)]

    out = []
    for i in range(4):
        hi_word = _xor(_xor(h[i], final[i]), final[i + 8])
        out.append(jnp.broadcast_to(hi_word[0], shape))
        out.append(jnp.broadcast_to(hi_word[1], shape))
    return out


def leaf_digests(mont: jnp.ndarray):
    """(8, w) Montgomery limbs -> 8 rows of (w,) digest words for the
    bincode(FieldElement) leaves (single Blake2b block each)."""
    plain = fo.from_mont(mont)
    d = [plain[2 * j] | (plain[2 * j + 1] << 16) for j in range(4)]
    return leaf_digests_from_digits(d)


def leaf_digests_from_digits(d):
    """Same, from the 4 plain base-2^32 digit rows ((4, w) array or a
    list of 4 (w,) rows)."""
    if not isinstance(d, (list, tuple)):
        d = [d[i] for i in range(4)]
    one = jnp.uint32(1)
    k = jnp.where(
        d[3] != 0, jnp.uint32(4),
        jnp.where(d[2] != 0, jnp.uint32(3),
                  jnp.where(d[1] != 0, jnp.uint32(2),
                            jnp.where(d[0] != 0, one, jnp.uint32(0)))),
    )
    sign = jnp.where(k > 0, jnp.uint32(2), one)  # Plus=2 / NoSign=1
    t = jnp.uint32(12) + jnp.uint32(4) * k
    zero = jnp.zeros_like(d[0])
    m = [
        (sign, k),
        (zero, d[0]),
        (d[1], d[2]),
        (d[3], zero),
    ] + [_ZERO] * 12
    return blake2b256_single_block(m, t)


def level_hash(child_rows):
    """One interior level: 8 rows of (w,) digest words -> 8 rows of
    (w/2,) parent digest words (H(left || right), 64-byte blocks)."""
    left = [r[0::2] for r in child_rows]
    right = [r[1::2] for r in child_rows]
    m = [
        (left[0], left[1]), (left[2], left[3]),
        (left[4], left[5]), (left[6], left[7]),
        (right[0], right[1]), (right[2], right[3]),
        (right[4], right[5]), (right[6], right[7]),
    ] + [_ZERO] * 8
    return blake2b256_single_block(m, 64)


def _use_pallas_tree(n: int) -> bool:
    env = os.environ.get("STARK_TPU_PALLAS_MERKLE")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu" and n % 2048 == 0 and n >= 2048


def tree_arrays_with_root(mont: jnp.ndarray, n: int):
    """Traceable whole-tree build INCLUDING the root: returns
    ``(levels, root_words)`` where ``levels`` are the stacked (8, w)
    digest levels from the leaves down to TAIL_WIDTH (device-resident
    for query openings) and ``root_words`` is the (8,) uint32 root —
    the fused FRI cascade hashes all the way up on the device so the
    per-round host fetch (tail + top hashing) disappears from the
    commit critical path.

    On TPU the hashing runs in the Pallas kernels
    (:mod:`stark_tpu.ops.pallas_merkle` — compress fully in registers,
    ~4x the XLA path); bytes are identical either way (the kernels
    trace the same compress function; pinned in interpret mode by
    tests/test_pallas_merkle.py)."""
    if _use_pallas_tree(n):
        from .pallas_merkle import tree_levels

        plain = fo.from_mont(mont)
        digits = jnp.stack(
            [plain[2 * j] | (plain[2 * j + 1] << 16) for j in range(4)]
        )
        return tree_levels(digits, TAIL_WIDTH)
    rows = leaf_digests(mont)
    out = [jnp.stack(rows)]
    w = n
    while w > TAIL_WIDTH:
        rows = level_hash(rows)
        w //= 2
        out.append(jnp.stack(rows))
    while w > 1:
        rows = level_hash(rows)
        w //= 2
    root = jnp.stack([r.reshape(()) for r in rows])
    return tuple(out), root


@lru_cache(maxsize=32)
def _tree_fn(n: int):
    """Jitted whole-tree builder for size n: Montgomery codeword in,
    ((leaf level, every level down to TAIL_WIDTH), root words) out, one
    dispatch.  The root is hashed on the device too, so reading it costs
    a 32-byte fetch instead of the 32 KB tail (which stays device-side
    until the query phase batches it with the sibling gathers)."""

    def build(mont):
        return tree_arrays_with_root(mont, n)

    return jax.jit(build)


def _digest_bytes(words: np.ndarray) -> bytes:
    """(8,) uint32 words -> 32 digest bytes."""
    return np.ascontiguousarray(words.astype("<u4")).tobytes()


def _level_bytes(arr: np.ndarray) -> bytes:
    """(8, w) uint32 level -> concatenated 32-byte digests."""
    return np.ascontiguousarray(arr.T.astype("<u4")).tobytes()


def roots_batch(trees) -> List[bytes]:
    """Roots of many trees with at most ONE device fetch: stacks every
    still-on-device root-word vector into a single gather (the commit
    phase reads several 2^20-tree roots back-to-back; a blocking fetch
    per tree costs a full tunnel round trip each)."""
    jobs = [
        (t, t.root_words_async() if hasattr(t, "root_words_async") else None)
        for t in trees
    ]
    arrs = [w for _, w in jobs if w is not None]
    if arrs:
        flat = np.asarray(jax.device_get(jnp.stack(arrs)))
        i = 0
        for t, w in jobs:
            if w is not None:
                t.set_root(_digest_bytes(flat[i]))
                i += 1
    return [t.root for t, _ in jobs]


def _bucket_pad(items: List[int], min_size: int = 8) -> List[int]:
    """Pad to the next power-of-two length (>= min_size) by repeating the
    first entry — stabilizes gather shapes across proofs so the jitted
    gather compiles once per bucket signature."""
    k = len(items)
    size = max(min_size, 1 << (k - 1).bit_length())
    return items + [items[0]] * (size - k)


_SIB_GATHER_FNS: Dict[int, object] = {}


def _sibling_gather_fn(num_levels: int):
    """jit((levels...), (idx...)) -> (8, sum K) concatenated column
    gather — one dispatch for a whole tree's auth-path siblings."""
    fn = _SIB_GATHER_FNS.get(num_levels)
    if fn is None:

        def gather(levels, idxs):
            return jnp.concatenate(
                [lv[:, ix] for lv, ix in zip(levels, idxs)], axis=1
            )

        fn = _SIB_GATHER_FNS[num_levels] = jax.jit(gather)
    return fn


class DeviceMerkleTree:
    """Merkle tree whose upper levels live on the device.

    Same public surface as :class:`stark_tpu.merkle.MerkleTree` (``root``,
    ``open``, ``num_leaves``) plus ``prefetch(indices)`` which pulls every
    auth-path sibling those indices will need in one batched fetch per
    tree.  ``open`` without prefetch still works (one tiny fetch per
    device-level sibling)."""

    __slots__ = (
        "num_leaves", "_device_levels", "_host_levels", "_tail_arr",
        "_log_n", "_log_tail_gap", "_sib_cache", "_root_bytes",
        "_root_words",
    )

    def __init__(self, mont: jnp.ndarray) -> None:
        n = int(mont.shape[1])
        if n < 2 * TAIL_WIDTH or n & (n - 1):
            raise ValueError(
                f"device tree needs a power-of-two codeword >= {2 * TAIL_WIDTH}"
            )
        arrays, root_words = _tree_fn(n)(mont)
        self._init_from_arrays(n, arrays, None)
        self._root_words = root_words

    @classmethod
    def from_cascade(cls, n: int, arrays, root: bytes) -> "DeviceMerkleTree":
        """Wrap level arrays produced inside the fused FRI cascade (the
        root was hashed on device and fetched with the round-roots
        batch, so ``.root`` never blocks on the 32 KB tail)."""
        tree = cls.__new__(cls)
        tree._init_from_arrays(n, arrays, root)
        return tree

    def _init_from_arrays(self, n: int, arrays, root) -> None:
        self._root_words = None
        self.num_leaves = n
        # widths n .. 2*TAIL stay device-resident; the TAIL-wide level is
        # fetched (32 KB) and the top finishes on the host — LAZILY, so
        # constructing several trees back-to-back queues all their hash
        # kernels before the first host fetch blocks (the prover
        # dispatches the boundary-quotient and randomizer trees together
        # and only then reads the roots in transcript order)
        self._device_levels = list(arrays[:-1])
        self._tail_arr = arrays[-1]
        self._host_levels = None
        self._log_n = n.bit_length() - 1
        self._log_tail_gap = self._log_n - TAIL_WIDTH.bit_length() + 1
        self._sib_cache: Dict[tuple, bytes] = {}
        self._root_bytes = root

    def tail_async(self):
        """The (8, TAIL_WIDTH) tail level if it still needs fetching —
        lets the query phase bundle every tree's tail into the one
        batched sibling fetch instead of a blocking fetch per tree."""
        return self._tail_arr if self._host_levels is None else None

    def absorb_tail(self, arr: np.ndarray) -> None:
        """Finish the host top levels from an externally fetched tail."""
        if self._host_levels is not None:
            return
        self._tail_arr = None
        host_levels = [_level_bytes(arr)]
        while len(host_levels[-1]) > 32:
            host_levels.append(merkle_level(host_levels[-1]))
        self._host_levels = host_levels

    def _finish_top(self) -> List[bytes]:
        if self._host_levels is None:
            self.absorb_tail(np.asarray(jax.device_get(self._tail_arr)))
        return self._host_levels

    def root_words_async(self):
        """The device (8,) uint32 root-word array, or None if the root is
        already known host-side — lets the prover stack many trees' roots
        into ONE fetch (see Stark's commit phase)."""
        if self._root_bytes is not None or self._host_levels is not None:
            return None
        return self._root_words

    def set_root(self, root: bytes) -> None:
        self._root_bytes = root

    @property
    def root(self) -> bytes:
        if self._root_bytes is not None:
            return self._root_bytes
        if self._host_levels is not None:
            # tail already absorbed: the root is host-derivable for free
            return self._finish_top()[-1]
        if self._root_words is not None:
            self._root_bytes = _digest_bytes(
                np.asarray(jax.device_get(self._root_words))
            )
            return self._root_bytes
        return self._finish_top()[-1]

    def gather_siblings_async(self, indices: Sequence[int]):
        """Dispatch (but don't fetch) the gathers for every device-level
        auth-path sibling of ``indices``.  Returns (keys, device array of
        shape (8, len(keys))) or (keys, None) when nothing is missing —
        lets a caller concatenate gathers across MANY trees into one
        host fetch (see fri._query_phase).

        The whole tree's gather is ONE jitted dispatch with the index
        vector of each level padded to a power-of-two bucket (repeating
        the first sibling): the round-4 shape ran ~10 EAGER slice ops
        per tree through a 5-30 ms-per-dispatch tunnel, and the
        proof-dependent index counts made every dispatch a fresh tiny
        compile.  Padding costs <2x fetch columns; duplicate keys just
        overwrite the same cache slot."""
        per_level: List[tuple] = []
        wanted: List[tuple] = []
        for lvl in range(len(self._device_levels)):
            sibs = sorted({(int(i) >> lvl) ^ 1 for i in indices})
            sibs = [s for s in sibs if (lvl, s) not in self._sib_cache]
            if not sibs:
                continue
            padded = _bucket_pad(sibs)
            wanted.extend((lvl, s) for s in padded)
            per_level.append((self._device_levels[lvl],
                              np.asarray(padded, dtype=np.int32)))
        if not wanted:
            return [], None
        fn = _sibling_gather_fn(len(per_level))
        return wanted, fn(
            tuple(lv for lv, _ in per_level),
            tuple(ix for _, ix in per_level),
        )

    def absorb_siblings(self, keys, flat: np.ndarray) -> None:
        """Fill the sibling cache from a fetched gather (columns of
        ``flat`` correspond to ``keys`` in order)."""
        for col, key in enumerate(keys):
            self._sib_cache[key] = _digest_bytes(flat[:, col])

    def prefetch(self, indices: Sequence[int]) -> None:
        """Batch-gather every device-level sibling the auth paths of
        ``indices`` will touch — plus the top-level tail if it hasn't
        crossed yet; one host fetch for the whole tree."""
        from .device_prover import fetch_absorb

        keys, arr = self.gather_siblings_async(indices)
        jobs = []
        if keys:
            jobs.append(
                (arr, lambda s: self.absorb_siblings(keys, s))
            )
        tail = self.tail_async()
        if tail is not None:
            jobs.append((tail, self.absorb_tail))
        fetch_absorb(jobs)

    def _device_sibling(self, lvl: int, sib: int) -> bytes:
        key = (lvl, sib)
        if key not in self._sib_cache:
            col = np.asarray(jax.device_get(self._device_levels[lvl][:, sib]))
            self._sib_cache[key] = _digest_bytes(col)
        return self._sib_cache[key]

    def open(self, index: int) -> List[bytes]:
        """Auth path: sibling digests, leaf level first (byte-identical
        to MerkleTree.open; reference merkle.rs:54-93)."""
        if not 0 <= index < self.num_leaves:
            raise IndexError("leaf index out of range")
        path: List[bytes] = []
        for lvl in range(self._log_n):
            sib = (index >> lvl) ^ 1
            if lvl < len(self._device_levels):
                path.append(self._device_sibling(lvl, sib))
            else:
                host = self._finish_top()[lvl - self._log_tail_gap]
                path.append(host[32 * sib : 32 * sib + 32])
        return path
