"""Device-resident prover core: codewords live on the TPU end-to-end.

Round 1's backend seam moved individual ops to the device but round-tripped
every codeword through ``List[int]`` (O(n) Python-int pack/unpack per
stage).  This module keeps every prover-side codeword as an ``(8, n)``
Montgomery limb array on the device across the whole pipeline

    RS-extension -> AIR evaluation -> transition quotients -> weighted
    combination -> FRI fold cascade

(the pipeline the reference runs as host loops, stark.rs:223-471), and
crosses to the host exactly once per committed codeword — as a packed
``(n, 4)`` uint32 *digit* matrix that feeds the native C Merkle hasher
directly.  No Python-int materialization happens for any full-length
codeword; only the handful of opened leaves become ints.

Key pieces:

* :class:`DeviceCodeword` — an (8, n) Montgomery device array + lazily
  computed host digit matrix (plain form, base-2^32 rows);
* :class:`DeviceProverCore` — per-(n, offset) compiled machinery: coset
  RS-extension, device-built geometric tables (x^shift columns, FRI
  inverse tables), the FRI fold, and the one-dispatch combination
  megakernel (trace extends + AIR + quotients + degree probe + weighted
  combination traced into a single XLA executable);
* digit helpers shared with the sharded core.

Bit-exactness with the host golden pipeline is pinned by
tests/test_device_prover.py (byte-identical transcripts).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import NUM_LIMBS, P
from . import field_ops as fo
from .backend import best_plan
from .fold import fold_mont
from .limbs import pack
from .ntt import _mont_pack


# ---------------------------------------------------------------------------
# digit conversion (device Montgomery limbs <-> host base-2^32 digit rows)
# ---------------------------------------------------------------------------


@jax.jit
def _plain_digits(mont: jnp.ndarray) -> jnp.ndarray:
    """(8, n) Montgomery -> (4, n) plain-form base-2^32 digits (on device,
    so the host transfer is half the size of the raw limb array)."""
    plain = fo.from_mont(mont)
    lo = plain[0::2]
    hi = plain[1::2]
    return lo | (hi << 16)


@jax.jit
def _value_gather(mont: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """One-dispatch column gather + Montgomery strip for leaf openings."""
    return _plain_digits(mont[:, idx])


def mont_to_digits(mont: jnp.ndarray) -> np.ndarray:
    """Device (8, n) Montgomery array -> host (n, 4) uint32 digit rows —
    the exact input of the native serialize+hash Merkle path."""
    d = np.asarray(jax.device_get(_plain_digits(mont)))
    return np.ascontiguousarray(d.T)


def digits_value(digits: np.ndarray, i: int) -> int:
    """One digit row -> Python int (for opened leaves / transcripts)."""
    d = digits[i]
    return int(d[0]) | int(d[1]) << 32 | int(d[2]) << 64 | int(d[3]) << 96


class DigitsView:
    """List-of-ints facade over a digit matrix (len / index / iterate) so
    transcript code written for ``List[int]`` works unchanged."""

    __slots__ = ("digits",)

    def __init__(self, digits: np.ndarray) -> None:
        self.digits = digits

    def __len__(self) -> int:
        return self.digits.shape[0]

    def __getitem__(self, i: int) -> int:
        return digits_value(self.digits, i)

    def __iter__(self):
        for i in range(len(self)):
            yield digits_value(self.digits, i)


class DeviceCodeword:
    """An (8, n) Montgomery codeword on device, with a lazily gathered
    host digit matrix for hashing/openings."""

    __slots__ = ("mont", "core", "_digits", "_val_cache")

    def __init__(self, mont: jnp.ndarray, core: "DeviceProverCore") -> None:
        self.mont = mont
        self.core = core
        self._digits = None
        self._val_cache: Dict[int, int] = {}

    def __len__(self) -> int:
        # codeword length regardless of layout: (8, n) natural or
        # (8, R, C) four-step (sharded cores)
        n = 1
        for d in self.mont.shape[1:]:
            n *= d
        return n

    @property
    def digits(self) -> np.ndarray:
        if self._digits is None:
            self._digits = self.core.to_digits(self.mont)
        return self._digits

    def gather_values_async(self, indices):
        """Dispatch (but don't fetch) the digit gather for ``indices``;
        returns (idx_list, (4, K) device array) or ([], None) — lets the
        FRI query phase combine value gathers across all rounds into one
        host fetch.  Gather + Montgomery strip run as ONE jitted
        dispatch with the index vector bucket-padded (stable shapes; the
        eager form cost a tunnel round trip + tiny recompile per
        proof-dependent index count)."""
        if self._digits is not None or self.mont.ndim != 2:
            return [], None  # digits already on host (or four-step layout)
        idx = sorted({int(i) for i in indices} - self._val_cache.keys())
        if not idx:
            return [], None
        from .device_merkle import _bucket_pad

        padded = _bucket_pad(idx)
        arr = _value_gather(self.mont, np.asarray(padded, dtype=np.int32))
        return padded, arr

    def absorb_values(self, idx, digits_cols: np.ndarray) -> None:
        """Fill the value cache from a fetched (4, K) digit gather."""
        d = digits_cols.T
        for row, i in enumerate(idx):
            self._val_cache[i] = digits_value(d, row)

    def prefetch_values(self, indices) -> None:
        """Batch-gather a handful of leaf values (one small host fetch)
        without materializing the full digit matrix — the point of the
        device-resident commitment path (a full fetch at 2^20 is 16 MB
        over a ~10 MB/s tunnel)."""
        idx, arr = self.gather_values_async(indices)
        if not idx:
            return
        self.absorb_values(idx, np.asarray(jax.device_get(arr)))

    def value(self, i: int) -> int:
        i = int(i)
        if self._digits is None and self.mont.ndim == 2:
            if i not in self._val_cache:
                self.prefetch_values([i])
            return self._val_cache[i]
        return digits_value(self.digits, i)

    def view(self) -> "DeviceCodewordView":
        return DeviceCodewordView(self)

    def to_list(self) -> List[int]:
        return list(self.view())


class DeviceCodewordView:
    """List-of-ints facade over a :class:`DeviceCodeword` that reads
    single values through the gather cache (``prefetch`` hook for the
    FRI query phase) and only materializes the full digit matrix when
    actually iterated (the last, tiny FRI codeword)."""

    __slots__ = ("_dcw",)

    def __init__(self, dcw: DeviceCodeword) -> None:
        self._dcw = dcw

    def __len__(self) -> int:
        return len(self._dcw)

    def __getitem__(self, i: int) -> int:
        return self._dcw.value(i)

    def prefetch(self, indices) -> None:
        self._dcw.prefetch_values(indices)

    def __iter__(self):
        digits = self._dcw.digits  # full fetch: only for small codewords
        for i in range(len(self)):
            yield digits_value(digits, i)


# ---------------------------------------------------------------------------
# geometric tables built on device (no O(n) host loops)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2,))
def _geometric_from_bits(
    bit_bases: jnp.ndarray, start: jnp.ndarray, n: int
) -> jnp.ndarray:
    """table[i] = start * base^i for i < n, from the bit decomposition of i
    (bit_bases[:, b] = base^(2^b), all Montgomery form).  log2(n) batched
    multiplies in one executable instead of an O(n) sequential host loop."""
    idx = jax.lax.iota(jnp.uint32, n)
    acc = jnp.broadcast_to(start, (NUM_LIMBS, n))
    for b in range(bit_bases.shape[1]):
        factor = bit_bases[:, b : b + 1]
        mult = fo.mont_mul(acc, factor)
        acc = jnp.where((((idx >> b) & 1) == 1)[None, :], mult, acc)
    return acc


def geometric_table(base: int, start: int, n: int) -> jnp.ndarray:
    """Montgomery (8, n) table of start * base^i, built on device."""
    if n == 1:
        return jnp.asarray(_mont_pack([start % P]))
    k = (n - 1).bit_length()
    bases = [pow(base, 1 << b, P) for b in range(k)]
    return _geometric_from_bits(
        jnp.asarray(_mont_pack(bases)),
        jnp.asarray(_mont_pack([start % P])),
        n,
    )


def fetch_absorb(jobs) -> None:
    """One batched device fetch for many gathers: ``jobs`` is a sequence
    of ``(device_array, absorb_fn)`` pairs (arrays all (R, K), same R —
    pad narrower ones before calling).  Concatenates along axis 1,
    fetches ONCE, and hands each absorb_fn its column slice in order —
    the single place that owns the offset bookkeeping the query-phase,
    openings and per-tree prefetch paths all need."""
    jobs = [(a, f) for a, f in jobs if a is not None]
    if not jobs:
        return
    flat = np.asarray(
        jax.device_get(jnp.concatenate([a for a, _ in jobs], axis=1))
    )
    off = 0
    for a, f in jobs:
        k = int(a.shape[1])
        f(flat[:, off : off + k])
        off += k


def pad_rows(arr: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Zero-pad a (r, K) device array to (rows, K) so differently-shaped
    gathers can share one fetch_absorb transfer."""
    r = int(arr.shape[0])
    if r == rows:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((rows - r,) + arr.shape[1:], arr.dtype)], axis=0
    )


def degree_probe_with(
    core, restrict_iszero_raw, stack: jnp.ndarray, tabs=None
) -> List[int]:
    """Shared degree-probe implementation (natural and sharded cores):
    jit one function that restricts each stacked codeword to coefficients
    and reduces max(index of nonzero) on the device.  The reshape(-1)
    makes the four-step (8, R, C) layout's row-major flattening equal the
    natural coefficient index j = j1*C + j2.  ``restrict_iszero_raw``
    takes (codeword, tabs); ``tabs`` carries the inverse-NTT tables as
    jit arguments (None for cores whose restrict needs none)."""
    k = int(stack.shape[0])
    key = ("degree_probe", k, stack.shape)
    cache = core._comb_cache
    fn = cache.get(key)
    if fn is None:

        def run(st, t):
            outs = []
            for i in range(k):
                z = restrict_iszero_raw(st[i], t).reshape(-1)
                idx = jax.lax.iota(jnp.int32, z.shape[0])
                outs.append(jnp.max(jnp.where(z, 0, idx)))
            return jnp.stack(outs)

        fn = cache[key] = jax.jit(run)
    out = fn(stack, tabs)
    if not getattr(out, "is_fully_addressable", True):
        # sharded cores on a process-spanning mesh: the (k,) result is
        # replicated over remote devices too — allgather-fetch it
        from ..parallel.mesh import global_device_get

        return [int(d) for d in np.asarray(global_device_get(out))]
    return [int(d) for d in np.asarray(jax.device_get(out))]


# ---------------------------------------------------------------------------
# the core
# ---------------------------------------------------------------------------

_CORE_CACHE: Dict[Tuple[int, int], "DeviceProverCore"] = {}
_CORE_CACHE_LOCK = None


def _core_lock():
    global _CORE_CACHE_LOCK
    if _CORE_CACHE_LOCK is None:
        import threading

        _CORE_CACHE_LOCK = threading.Lock()
    return _CORE_CACHE_LOCK


def get_core(n: int, offset: int) -> "DeviceProverCore":
    """Process-wide DeviceProverCore per (n, offset).

    The core's jitted executables (RS extend, FRI cascade rounds, device
    Merkle tree) are pure functions of (n, offset) plus call shapes, and
    the giant ones cost minutes EACH to compile — or even to re-load
    from the persistent cache through the remote-compile tunnel.  Two
    Stark instances with the same FRI domain (e.g. the fibonacci and
    rescue-chain flagships, both 2^20 on the standard coset) must share
    one core so the second pays nothing.  All core state is keyed by
    shape/omega/structure — nothing trace- or proof-specific lives here
    (per-prove caches stay on the Stark instance)."""
    key = (n, offset % P)
    core = _CORE_CACHE.get(key)
    if core is None:
        # double-checked lock: precompile work is thread-pooled, and two
        # threads racing the first lookup would each build (and compile)
        # a separate core, leaving one unshared
        with _core_lock():
            core = _CORE_CACHE.get(key)
            if core is None:
                core = _CORE_CACHE[key] = DeviceProverCore(n, offset)
    return core


class DeviceProverCore:
    """Compiled device machinery for one (fri_domain_length, offset)."""

    def __init__(self, n: int, offset: int) -> None:
        self.n = n
        self.offset = offset % P
        self.plan = best_plan(n)
        self._inv_tables: Dict[Tuple[int, int, int], jnp.ndarray] = {}
        self._shift_tables: Dict[Tuple[int, int], jnp.ndarray] = {}
        self._comb_cache: Dict[tuple, object] = {}

        # ONE compiled extend / restrict for every coefficient length
        # (host-side zero-pad to n): every distinct jit would re-compile
        # the full NTT graph, which is expensive on XLA:CPU and through
        # the TPU tunnel's cold path.  NTT twiddle tables are threaded as
        # ARGUMENTS (plan.op_tables / plan.apply) so they are operands of
        # the compiled modules, not ~32 MB embedded constants (which made
        # every extend executable ~90 MB serialized).
        plan, offset_v = self.plan, self.offset
        self._fwd_tabs = plan.op_tables(False, offset_v)
        self._inv_tabs = plan.op_tables(True, offset_v)

        def ext(a, t):  # (8, n) plain packed
            return plan.apply(fo.to_mont(a), t, False)

        def restrict_iszero(cw, t):  # (8, n) Montgomery codeword
            coeffs = plan.apply(cw, t, True)
            return fo.is_zero(coeffs)

        def ext_mont(a, t):  # (8, m) Montgomery coefficients, m <= n
            m = a.shape[1]
            if m < n:
                a = jnp.concatenate(
                    [a, jnp.zeros((NUM_LIMBS, n - m), jnp.uint32)], axis=1
                )
            return plan.apply(a, t, False)

        self._ext_jit = jax.jit(ext)
        self._ext_mont_jit = jax.jit(ext_mont)
        self._restrict_iszero_raw = restrict_iszero
        self._restrict_iszero_jit = jax.jit(restrict_iszero)

    # -- RS extension ------------------------------------------------------

    def extend(self, coeffs) -> jnp.ndarray:
        """Coefficients (plain ints lowest-first, or an already-packed
        (8, m) uint32 limb array) -> (8, n) Montgomery codeword over the
        coset {offset * omega^i}.

        Zero-padding to the domain happens ON the device: the host→device
        link runs at tens of MB/s, so uploading a 2^18-coefficient
        randomizer padded to a 2^20 domain would quadruple the transfer."""
        if isinstance(coeffs, np.ndarray) or isinstance(coeffs, jax.Array):
            packed = coeffs
        else:
            packed = pack(list(coeffs))
        if packed.shape[1] > self.n:
            raise ValueError("coefficient vector longer than the domain")
        dev = jnp.asarray(packed)
        if packed.shape[1] < self.n:
            dev = jnp.concatenate(
                [
                    dev,
                    jnp.zeros(
                        (NUM_LIMBS, self.n - packed.shape[1]), jnp.uint32
                    ),
                ],
                axis=1,
            )
        return self._ext_jit(dev, self._fwd_tabs)

    def extend_mont(self, coeffs_mont: jnp.ndarray) -> jnp.ndarray:
        """Device-resident Montgomery coefficient array (8, m) -> (8, n)
        coset codeword — the RS-extension for coefficients that never
        lived on the host (device trace interpolation)."""
        if coeffs_mont.shape[1] > self.n:
            raise ValueError("coefficient vector longer than the domain")
        return self._ext_mont_jit(coeffs_mont, self._fwd_tabs)

    def extend_codeword(self, coeffs: Sequence[int]) -> DeviceCodeword:
        return DeviceCodeword(self.extend(coeffs), self)

    def extend_codeword_be17(self, raw: bytes) -> DeviceCodeword:
        """Randomizer fast path: concatenated 17-byte big-endian rng
        chunks -> extended codeword, with the byte->limb unpack and the
        mod-p reduction ON the device (bit-identical to
        ``extend_codeword(pack_be17(raw))``; the host-side pack was
        0.2-0.3 s of serial numpy per flagship prove — round-5
        attribution)."""
        return DeviceCodeword(self.extend(fo.be17_device_limbs(raw)), self)

    def restrict_iszero(self, cw_mont: jnp.ndarray) -> np.ndarray:
        """Codeword -> is-zero bitmap of its coefficient vector (the degree
        probe; the coefficients themselves never leave the device)."""
        return np.asarray(
            jax.device_get(self._restrict_iszero_jit(cw_mont, self._inv_tabs))
        )

    def degree_probe(self, stack: jnp.ndarray) -> List[int]:
        """Degrees of a (k, 8, n) stack of codewords in ONE dispatch and a
        (k,)-int fetch: restrict to coefficients, reduce last-nonzero-index
        on the device (zero polynomial -> 0, the host quirk) — instead of
        fetching k full n-bit bitmaps (1 MB each at 2^20) over the
        ~10 MB/s tunnel."""
        return degree_probe_with(
            self, self._restrict_iszero_raw, stack, self._inv_tabs
        )

    def to_digits(self, mont: jnp.ndarray) -> np.ndarray:
        """Layout hook for :class:`DeviceCodeword` (natural (8, n) here)."""
        return mont_to_digits(mont)

    def merkle_tree(self, dcw: DeviceCodeword):
        """Merkle commitment over the codeword's bincode leaves.

        Large natural-layout codewords hash ON the device (vectorized
        Blake2b-256, :mod:`stark_tpu.ops.device_merkle`) — only the
        32 KB level tail, the root and the opened siblings ever cross to
        the host.  Small codewords take the digit-matrix + native-C path
        (lower latency than a device dispatch round-trip).  Roots and
        auth paths are byte-identical either way (pinned by tests)."""
        from .device_merkle import DEVICE_TREE_MIN, TAIL_WIDTH, DeviceMerkleTree

        if (
            dcw.mont.ndim == 2
            and dcw.mont.shape[1] >= max(DEVICE_TREE_MIN, 2 * TAIL_WIDTH)
            and dcw._digits is None
        ):
            return DeviceMerkleTree(dcw.mont)
        from ..merkle import MerkleTree

        return MerkleTree.from_digits(dcw.digits)

    # -- FRI fold ----------------------------------------------------------

    def _inv_table(self, offset: int, omega: int, half: int) -> jnp.ndarray:
        """[(offset * omega^i)^{-1}, i < half] = geometric series with base
        omega^{-1} and start offset^{-1} — built on device."""
        key = (offset % P, omega % P, half)
        tab = self._inv_tables.get(key)
        if tab is None:
            tab = geometric_table(
                pow(omega, -1, P), pow(offset, -1, P), half
            )
            self._inv_tables[key] = tab
        return tab

    def fold(
        self, dcw: DeviceCodeword, alpha: int, offset: int, omega: int
    ) -> DeviceCodeword:
        """One FRI fold round, entirely on device (reference fold semantics
        fri.rs:133-139 via :func:`stark_tpu.ops.fold.fold_mont`)."""
        half = len(dcw) // 2
        inv = self._inv_table(offset, omega, half)
        alpha_mont = jnp.asarray(_mont_pack([alpha % P]))
        return DeviceCodeword(fold_mont(dcw.mont, alpha_mont, inv), self)

    # -- fused FRI commit cascade (on-device Fiat-Shamir) -------------------

    def fri_cascade(
        self,
        mont: jnp.ndarray,
        prefix_body: bytes,
        count0: int,
        offset: int,
        omega: int,
        rounds: int,
    ):
        """``rounds`` fused FRI commit rounds in ONE dispatch: per round,
        Merkle tree (to the root, on device) -> hex root appended to the
        bincode transcript body -> Shake256 Fiat-Shamir -> fold challenge
        alpha -> fold.  The host is never consulted mid-cascade — the
        commit loop's per-round tunnel crossings (tree dispatch, 32 KB
        tail fetch, fold dispatch: ~3 x ~30 ms each on this link) all
        collapse into one dispatch plus one tiny root fetch.

        ``prefix_body`` is the serialized proof stream WITHOUT its
        leading u64 count (the count changes with every push, so it is
        re-prepended per round from ``count0``); transcript semantics
        are the reference's exactly (proof_stream.rs:36-58, fri.rs:100-146).

        Returns ``(per_round, roots, final_mont)`` where ``per_round[r]``
        is ``(codeword_mont_r, tree_levels_r)``, ``roots`` is a
        (rounds, 8) uint32 array of root words, and ``final_mont`` is the
        folded codeword after the last fused round.  Byte-identity of
        the resulting transcript with the unfused path is pinned by
        tests/test_device_fs.py."""
        n0 = int(mont.shape[1])
        body = jnp.asarray(np.frombuffer(prefix_body, dtype=np.uint8))
        cur = mont
        o, w = offset % P, omega % P
        per_round = []
        roots = []
        for r in range(rounds):
            n_r = n0 >> r
            fn = self._cascade_round_fn(
                n_r, int(body.shape[0]), count0 + r + 1
            )
            table = self._inv_table(o, w, n_r // 2)
            levels, root, body, nxt = fn(cur, body, table)
            per_round.append((cur, levels))
            roots.append(root)
            cur = nxt
            o, w = o * o % P, w * w % P
        return tuple(per_round), jnp.stack(roots), cur

    def _cascade_round_fn(self, n_r: int, body_len: int, count_r: int):
        """One jitted executable PER ROUND (cached per shape/count), not
        one for the whole cascade: the per-round module is exactly the
        size of the already-proven single-tree compile, while fusing all
        rounds would stack ~8 unrolled Blake2b trees into one ~300k-op
        module (a remote-compile risk).  fri_cascade's host loop enqueues
        the rounds back-to-back WITHOUT any device fetch, so the commit
        critical path still crosses the tunnel exactly once (the stacked
        root fetch done by the caller).  Exposed as a method so
        :mod:`stark_tpu.ops.precompile` can compile every round's module
        CONCURRENTLY ahead of the first prove (the remote compile service
        parallelizes across threads almost perfectly)."""
        from .device_fs import alpha_mont_from_fs, hex_words
        from .device_keccak import shake256_words
        from .device_merkle import tree_arrays_with_root

        key = ("fri_cascade_round", n_r, body_len, count_r)
        fn = self._comb_cache.get(key)
        if fn is None:
            count_arr = jnp.asarray(
                np.frombuffer(
                    count_r.to_bytes(8, "little"), dtype=np.uint8
                )
            )
            len64_arr = jnp.asarray(
                np.frombuffer((64).to_bytes(8, "little"), dtype=np.uint8)
            )

            def run(cur, body, table):
                levels, root = tree_arrays_with_root(cur, n_r)
                body = jnp.concatenate([body, len64_arr, hex_words(root)])
                fs = shake256_words(jnp.concatenate([count_arr, body]))
                alpha = alpha_mont_from_fs(fs)
                return levels, root, body, fold_mont(cur, alpha, table)

            fn = self._comb_cache[key] = jax.jit(run)
        return fn

    # -- x^shift columns ---------------------------------------------------

    def shift_table(self, shift: int, omega: int) -> jnp.ndarray:
        """Codeword of x^shift over the coset: offset^shift * omega^(shift*i)
        (Montgomery, cached per shift)."""
        key = (shift, omega % P)
        tab = self._shift_tables.get(key)
        if tab is None:
            tab = geometric_table(
                pow(omega, shift, P), pow(self.offset, shift, P), self.n
            )
            self._shift_tables[key] = tab
        return tab

    # -- batch inversion ---------------------------------------------------

    def inverse(self, mont: jnp.ndarray) -> jnp.ndarray:
        """Elementwise inversion via Fermat (division-free, data-parallel —
        the TPU-native replacement for extended Euclid)."""
        return fo.mont_inv(mont)

    # -- the combination megakernel ---------------------------------------

    def combination_fn(self, structure: tuple, num_bq: int, expansion: int):
        """One jitted executable computing, from pre-extended trace
        codewords:

            shifted "next" rows (t(omicron*x_i) = t(x_{i+expansion})) ->
            AIR codewords (grouped-monomial evaluation; cached group
            codewords as inputs) -> transition quotients (pointwise product
            with the inverted zeroifier codeword) -> weighted combination
            with x^shift columns.

        Returns (combination, stacked transition-quotient codewords); the
        degree probe runs through the shared restrict executable.

        ``structure``: per constraint, a tuple of (state-tail exponent
        tuple, group-codeword index).  Cached per structural signature.
        """
        key = (structure, num_bq, expansion)
        fn = self._comb_cache.get(key)
        if fn is not None:
            return fn

        def comb_fn(
            trace_cws,  # tuple of (8, n) Montgomery
            group_cws,  # tuple of (8, n) Montgomery
            tz_invs,  # tuple of (8, n) Montgomery, one per constraint
            rand_cw,  # (8, n) Montgomery
            bq_cws,  # tuple of (8, n) Montgomery
            weights,  # (8, k) Montgomery
            tq_shift_tabs,  # tuple of (8, n) Montgomery
            bq_shift_tabs,  # tuple of (8, n) Montgomery
        ):
            next_cws = [
                jnp.roll(cw, -expansion, axis=-1) for cw in trace_cws
            ]
            state = list(trace_cws) + next_cws

            pow_cache: Dict[Tuple[int, int], jnp.ndarray] = {}

            def pow_col(i: int, e: int) -> jnp.ndarray:
                if e == 1:
                    return state[i]
                k2 = (i, e)
                if k2 not in pow_cache:
                    half = pow_col(i, e // 2)
                    sq = fo.mont_mul(half, half)
                    if e & 1:
                        sq = fo.mont_mul(sq, state[i])
                    pow_cache[k2] = sq
                return pow_cache[k2]

            airs = []
            for groups in structure:
                acc = None
                for tail, gi in groups:
                    term = group_cws[gi]
                    for i, e in enumerate(tail):
                        if e:
                            term = fo.mont_mul(term, pow_col(i, e))
                    acc = term if acc is None else fo.add(acc, term)
                airs.append(acc)

            tqs = [fo.mont_mul(a, tz_invs[i]) for i, a in enumerate(airs)]

            comb = fo.mont_mul(weights[:, 0:1], rand_cw)
            k2 = 1
            for i, t in enumerate(tqs):
                comb = fo.add(comb, fo.mont_mul(weights[:, k2 : k2 + 1], t))
                shifted = fo.mont_mul(tq_shift_tabs[i], t)
                comb = fo.add(
                    comb, fo.mont_mul(weights[:, k2 + 1 : k2 + 2], shifted)
                )
                k2 += 2
            for i, b in enumerate(bq_cws):
                comb = fo.add(comb, fo.mont_mul(weights[:, k2 : k2 + 1], b))
                shifted = fo.mont_mul(bq_shift_tabs[i], b)
                comb = fo.add(
                    comb, fo.mont_mul(weights[:, k2 + 1 : k2 + 2], shifted)
                )
                k2 += 2
            return comb, jnp.stack(tqs)

        fn = self._comb_cache[key] = jax.jit(comb_fn)
        return fn
