"""Full STARK proving over a device mesh.

:class:`ShardedProverCore` implements the device-prover core interface
(:mod:`stark_tpu.ops.device_prover`) with every codeword living as an
``(8, R, C)`` four-step-layout array sharded over a 1-D mesh (see
:mod:`stark_tpu.parallel.ntt_sharded` for the layout):

* RS-extension = coset prologue + sharded four-step NTT (one all_to_all);
* the "next row" shift, AIR evaluation, quotients and the weighted
  combination are elementwise GSPMD ops (the shift's tiny cross-shard
  slice is E*C elements, inserted by XLA as a collective);
* the degree probe runs the four-step-layout inverse transform
  (:meth:`ShardedNTT.inverse_from_fourstep` — the second all_to_all);
* FRI folds are shard-local (:class:`ShardedFold`) until C is exhausted,
  then the tiny tail folds on a replicated array.

Plugged into :class:`stark_tpu.stark.Stark` via :class:`ShardedBackend`,
the ENTIRE proof pipeline of reference stark.rs:223-471 runs on the mesh;
transcripts are byte-identical to the host and single-chip provers
(pinned by tests/test_sharded_stark.py on a CPU mesh).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..params import NUM_LIMBS, P
from ..ops import field_ops as fo
from ..ops.backend import JaxBackend
from ..ops.device_prover import (
    DeviceCodeword,
    geometric_table,
    mont_to_digits,
)
from ..ops.fold import fold_mont
from ..ops.limbs import pack
from ..ops.ntt import _mont_pack
from .fold_sharded import ShardedFold
from .mesh import global_device_get
from .ntt_sharded import ShardedNTT


class ShardedProverCore:
    """Device-prover core over a mesh; arrays in four-step layout."""

    def __init__(self, n: int, offset: int, mesh: Mesh) -> None:
        self.n = n
        self.offset = offset % P
        self.mesh = mesh
        self.sntt = ShardedNTT(n, mesh)
        self.R, self.C = self.sntt.R, self.sntt.C
        self.fold_sharded = ShardedFold(mesh, self.R)
        self._inv_tables: Dict[Tuple[int, int, int], jnp.ndarray] = {}
        self._shift_tables: Dict[Tuple[int, int], tuple] = {}
        self._comb_cache: Dict[tuple, object] = {}

        offset_v = self.offset
        # coset prologue: offset^(j1*C + j2) = (offset^C)^j1 x offset^j2
        prow = geometric_table(pow(offset_v, self.C, P), 1, self.R)
        pcol = geometric_table(offset_v, 1, self.C)
        # coset epilogue (restrict): offset^{-j} over the natural matrix
        inv_off = pow(offset_v, -1, P)
        erow = geometric_table(pow(inv_off, self.C, P), 1, self.R)
        ecol = geometric_table(inv_off, 1, self.C)
        sntt = self.sntt

        def ext(x):  # (8, R, C) plain packed, column-sharded
            m = fo.to_mont(x)
            m = fo.mont_mul(fo.mont_mul(m, prow[:, :, None]), pcol[:, None, :])
            return sntt.forward(m)

        def restrict_iszero(cw):  # (8, R, C) four-step layout
            coeffs = sntt.inverse_from_fourstep(cw)
            coeffs = fo.mont_mul(
                fo.mont_mul(coeffs, erow[:, :, None]), ecol[:, None, :]
            )
            return fo.is_zero(coeffs)

        self._ext_jit = jax.jit(ext)
        # degree_probe_with's calling convention passes NTT tables as a
        # second jit argument; the sharded restrict's (small, per-axis)
        # tables stay closure constants, so it ignores that slot
        self._restrict_iszero_raw = lambda cw, t: restrict_iszero(cw)
        self._restrict_iszero_jit = jax.jit(restrict_iszero)

        @jax.jit
        def digits4(mont):  # (8, R, C) Montgomery -> (4, R, C) plain digits
            plain = fo.from_mont(mont)
            return plain[0::2] | (plain[1::2] << 16)

        self._digits4 = digits4

        # digit conversion + the block reshard for distributed Merkle:
        # row(k1)-sharded four-step -> column(k2)-sharded, so each device
        # owns one CONTIGUOUS natural-index block of n/D leaves
        from jax import shard_map

        axis = self.sntt.axis

        def to_blocks(mont):
            d4 = digits4(mont)

            def reshard(x):
                return jax.lax.all_to_all(
                    x, axis, split_axis=2, concat_axis=1, tiled=True
                )

            return shard_map(
                reshard,
                mesh=mesh,
                in_specs=PS(None, axis, None),
                out_specs=PS(None, None, axis),
                check_vma=False,
            )(d4)

        self._digit_blocks_jit = jax.jit(to_blocks)

    # -- RS extension ------------------------------------------------------

    def extend(self, coeffs) -> jnp.ndarray:
        if isinstance(coeffs, np.ndarray):
            arr = coeffs
        else:
            arr = pack(list(coeffs))
        if arr.shape[1] > self.n:
            raise ValueError("coefficient vector longer than the domain")
        if arr.shape[1] < self.n:
            arr = np.concatenate(
                [arr, np.zeros((NUM_LIMBS, self.n - arr.shape[1]), np.uint32)],
                axis=1,
            )
        mat = arr.reshape(NUM_LIMBS, self.R, self.C)
        sharding = self.sntt.col_sharded
        if all(
            d.process_index == jax.process_index()
            for d in self.mesh.devices.flat
        ):
            x = jax.device_put(mat, sharding)
        else:
            # process-spanning mesh: every controller holds the same host
            # matrix; build the global array shard-by-shard
            x = jax.make_array_from_callback(
                mat.shape, sharding, lambda idx: mat[idx]
            )
        return self._ext_jit(x)

    def extend_codeword(self, coeffs: Sequence[int]) -> DeviceCodeword:
        return DeviceCodeword(self.extend(coeffs), self)

    def restrict_iszero(self, cw_mont: jnp.ndarray) -> np.ndarray:
        """Degree probe: natural-order is-zero bitmap of the coefficients."""
        bitmap = np.asarray(
            global_device_get(self._restrict_iszero_jit(cw_mont))
        )
        return bitmap.reshape(self.n)  # j = j1*C + j2: plain row-major

    def degree_probe(self, stack: jnp.ndarray):
        """Stacked degree probe, one dispatch + a (k,)-int fetch (see
        :func:`stark_tpu.ops.device_prover.degree_probe_with`)."""
        from ..ops.device_prover import degree_probe_with

        return degree_probe_with(self, self._restrict_iszero_raw, stack)

    # -- layout / commitment ----------------------------------------------

    def to_digits(self, mont: jnp.ndarray) -> np.ndarray:
        """Natural-order (len, 4) digit matrix from either layout."""
        if mont.ndim == 2:  # replicated tail (natural order)
            return mont_to_digits(mont)
        d = np.asarray(global_device_get(self._digits4(mont)))
        n = d.shape[1] * d.shape[2]
        # four-step layout: k = k1 + R*k2 lives at [k1, k2]
        nat = np.transpose(d, (0, 2, 1)).reshape(4, n)
        return np.ascontiguousarray(nat.T)

    def natural_digit_blocks(self, mont: jnp.ndarray) -> List[np.ndarray]:
        """Per-device natural-order digit blocks (contiguous leaf ranges,
        device b owning leaves [b*n/D, (b+1)*n/D)) after the block
        reshard — the distributed Merkle working set."""
        out = self._digit_blocks_jit(mont)
        if out.is_fully_addressable:
            shards = sorted(
                out.addressable_shards, key=lambda s: s.index[2].start or 0
            )
            locs = [np.asarray(shard.data) for shard in shards]
        else:
            # multi-controller: every process runs the same host-side
            # prover program and needs ALL blocks (subtree hashing +
            # query openings); reassemble the global (4, R, C) array and
            # slice the per-device column blocks.  At production scale
            # this crossing would instead gather subtree ROOTS only and
            # exchange opened paths lazily — sized for the SMALL proofs
            # the DCN-shaped tests run.
            full = np.asarray(global_device_get(out))
            d = self.sntt.d
            w = full.shape[2] // d
            locs = [full[:, :, b * w:(b + 1) * w] for b in range(d)]
        blocks = []
        for loc in locs:  # (4, R, C/D)
            m = loc.shape[1] * loc.shape[2]
            # within-block natural index = k1 + R*k2_local
            nat = np.transpose(loc, (0, 2, 1)).reshape(4, m)
            blocks.append(np.ascontiguousarray(nat.T))
        return blocks

    def merkle_tree(self, dcw: DeviceCodeword):
        """Distributed commitment: per-shard subtree hashing over
        natural-order blocks + top levels from the D subtree roots (see
        :mod:`stark_tpu.parallel.merkle_sharded`).  The block digits are
        reused as the codeword's host digits, so no monolithic gather
        happens for query openings either."""
        from ..merkle import MerkleTree
        from .merkle_sharded import tree_from_blocks

        mont = dcw.mont
        d = self.sntt.d
        if mont.ndim == 2 or mont.shape[2] % d:
            # replicated tail, or the fold cascade shrank C below the
            # device count (codeword is tiny by then): plain gather
            return MerkleTree.from_digits(dcw.digits)
        blocks = self.natural_digit_blocks(mont)
        if dcw._digits is None:
            dcw._digits = np.concatenate(blocks, axis=0)
        return tree_from_blocks(blocks)

    # -- FRI fold ----------------------------------------------------------

    def _tail_inv_table(self, offset: int, omega: int, half: int) -> jnp.ndarray:
        key = (offset % P, omega % P, half)
        tab = self._inv_tables.get(key)
        if tab is None:
            tab = geometric_table(pow(omega, -1, P), pow(offset, -1, P), half)
            self._inv_tables[key] = tab
        return tab

    def fold(
        self, dcw: DeviceCodeword, alpha: int, offset: int, omega: int
    ) -> DeviceCodeword:
        mont = dcw.mont
        if mont.ndim == 3 and mont.shape[2] == 1:
            # C exhausted: natural index k = k1 — drop to a replicated
            # natural-order array for the tiny tail
            mont = jnp.asarray(np.asarray(global_device_get(mont))[:, :, 0])
        if mont.ndim == 3:
            folded = self.fold_sharded(mont, alpha, offset, omega)
            return DeviceCodeword(folded, self)
        half = mont.shape[1] // 2
        inv = self._tail_inv_table(offset, omega, half)
        alpha_mont = jnp.asarray(_mont_pack([alpha % P]))
        return DeviceCodeword(fold_mont(mont, alpha_mont, inv), self)

    # -- x^shift columns (separable row x col pair) ------------------------

    def shift_table(self, shift: int, omega: int) -> tuple:
        """x^shift over the coset in four-step layout is separable:
        row[k1] = offset^shift * omega^(shift*k1),
        col[k2] = omega^(shift*R*k2).  Returns the (row, col) pair; the
        combination kernel applies them as two broadcast multiplies."""
        key = (shift, omega % P)
        tabs = self._shift_tables.get(key)
        if tabs is None:
            row = geometric_table(
                pow(omega, shift, P), pow(self.offset, shift, P), self.R
            )
            col = geometric_table(
                pow(omega, shift * self.R % (P - 1), P), 1, self.C
            )
            tabs = self._shift_tables[key] = (row, col)
        return tabs

    # -- batch inversion ---------------------------------------------------

    def inverse(self, mont: jnp.ndarray) -> jnp.ndarray:
        return fo.mont_inv(mont)

    # -- the combination ---------------------------------------------------

    def combination_fn(self, structure: tuple, num_bq: int, expansion: int):
        """Mesh variant of the combination kernel: same algebra as the
        single-chip core, with the natural-index shift done blockwise in
        four-step layout (cross-shard slice of E rows handled by GSPMD)."""
        key = (structure, num_bq, expansion)
        fn = self._comb_cache.get(key)
        if fn is not None:
            return fn

        def shift_by_expansion(cw):
            # next[k] = cw[(k + E) mod n]; k = k1 + R*k2 at [k1, k2]
            head = cw[:, expansion:, :]
            wrap = jnp.roll(cw[:, :expansion, :], -1, axis=2)
            return jnp.concatenate([head, wrap], axis=1)

        def apply_pair(t, pair):
            row, col = pair
            return fo.mont_mul(
                fo.mont_mul(t, row[:, :, None]), col[:, None, :]
            )

        def comb_fn(
            trace_cws,
            group_cws,
            tz_invs,  # tuple of arrays, one per constraint
            rand_cw,
            bq_cws,
            weights,  # (8, k) Montgomery
            tq_shift_tabs,  # tuple of (row, col) pairs
            bq_shift_tabs,
        ):
            next_cws = [shift_by_expansion(cw) for cw in trace_cws]
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

            comb = fo.mont_mul(weights[:, 0:1, None], rand_cw)
            k2 = 1
            for i, t in enumerate(tqs):
                comb = fo.add(
                    comb, fo.mont_mul(weights[:, k2 : k2 + 1, None], t)
                )
                shifted = apply_pair(t, tq_shift_tabs[i])
                comb = fo.add(
                    comb,
                    fo.mont_mul(weights[:, k2 + 1 : k2 + 2, None], shifted),
                )
                k2 += 2
            for i, b in enumerate(bq_cws):
                comb = fo.add(
                    comb, fo.mont_mul(weights[:, k2 : k2 + 1, None], b)
                )
                shifted = apply_pair(b, bq_shift_tabs[i])
                comb = fo.add(
                    comb,
                    fo.mont_mul(weights[:, k2 + 1 : k2 + 2, None], shifted),
                )
                k2 += 2
            return comb, jnp.stack(tqs)

        fn = self._comb_cache[key] = jax.jit(comb_fn)
        return fn


class ShardedBackend(JaxBackend):
    """Backend that runs the device-resident prover over a mesh: attach to
    :class:`stark_tpu.stark.Stark` for a full sharded STARK prove."""

    def __init__(self, mesh: Mesh, device_prover_min: int = 4096) -> None:
        self.mesh = mesh
        self.device_prover_min = device_prover_min
        self._core_cache: dict = {}

    def make_prover_core(self, n: int, offset: int) -> ShardedProverCore:
        # cached per backend (one mesh): Stark instances sharing a FRI
        # domain share the compiled sharded modules, mirroring
        # device_prover.get_core's process-wide cache
        key = (n, offset % P)  # same normalization as device_prover.get_core
        core = self._core_cache.get(key)
        if core is None:
            core = self._core_cache[key] = ShardedProverCore(
                n, offset, self.mesh
            )
        return core
