"""Pallas four-step NTT: the hot transform as fused VMEM-resident kernels.

The XLA stage-by-stage NTT round-trips HBM (and retiles layouts) between
every butterfly stage.  This module runs a full size-n transform as TWO
Pallas kernel passes via the four-step decomposition n = R * C:

    x[j1, j2]  --column NTTs over j1-->  A[k1, j2]
               --twiddle w^(k1*j2)   -->  (fused epilogue)
    transpose  --row NTTs over j2    -->  B[k2, k1],  X[k1 + R*k2] = B[k2, k1]

Each pass is one Pallas kernel: a batched small NTT along the SUBLANE axis
with the batch on the 128-wide lane axis, so every butterfly is a
full-width VPU op and the log2(R) stages run entirely in VMEM — one HBM
read and one HBM write per pass.

Layout rules that keep Mosaic happy (no padding waste):

* data block is (8, n_t, B) — limbs major, transform axis on sublanes,
  batch on lanes (B a multiple of 128);
* stages with half >= 8 use the (8, G, L, B) view — sublane slicing at
  half (a multiple of 8);
* stages with half < 8 flatten (L, B) into the minor axis and slice at
  half*B (a multiple of 128), with pre-tiled twiddle rows (tiny).

Coset scaling (Reed-Solomon extension offsets) and the inverse transform's
1/n are fused into kernel prologues/epilogues as row x column broadcast
multiplies; the inter-pass twiddle w^(k1*j2) is a precomputed HBM table
multiplied in the first pass's epilogue.

Differential-tested against the host NTT; used by the backend for large
transforms (the XLA path remains for small sizes and as fallback).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FieldElement
from ..params import NUM_LIMBS, P
from . import field_ops as fo
from .ntt import _bit_reverse_indices, _mont_pack, _power_table
from .pallas_fold import _k_add, _k_mont_mul, _k_sub

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_small_ntt_body(n_t: int, b: int, small_halves: int = 4):
    """Returns f(x, tw_packed, tiled_small) computing the size-n_t NTT along
    axis 1 of an (8, n_t, b) VMEM value (input already bit-reversed).

    tw_packed: (8, n_t) — stage s twiddles at [half : 2*half].
    tiled_small: (8, small_halves*2, b)-ish pre-tiled twiddles for the
    small stages, stage s at rows [half*? ...] — concretely rows
    [half, 2*half) of a (8, small_halves*2, b) buffer hold stage-s
    twiddles already repeated across the batch.
    """

    def stage(x, tw_packed, tiled_small, length):
        half = length // 2
        if half < small_halves:
            # flatten (L, B) into the minor axis; twiddles pre-tiled
            g = n_t // length
            xv = x.reshape(NUM_LIMBS, g, length * b)
            u = xv[:, :, : half * b]
            v = xv[:, :, half * b :]
            if length > 2:
                tw = tiled_small[:, half : 2 * half, :].reshape(
                    NUM_LIMBS, 1, half * b
                )
                tw = jnp.broadcast_to(tw, u.shape)
                v = _k_mont_mul(v, tw)
            # length == 2: the only twiddle is w^0 = 1; mont_mul by the
            # Montgomery one is the exact identity on canonical (< p)
            # values, so the multiply is skipped bit-exactly
            return jnp.concatenate(
                [_k_add(u, v), _k_sub(u, v)], axis=2
            ).reshape(NUM_LIMBS, n_t, b)
        g = n_t // length
        xv = x.reshape(NUM_LIMBS, g, length, b)
        u = xv[:, :, :half, :]
        v = xv[:, :, half:, :]
        tw = tw_packed[:, half : 2 * half].reshape(NUM_LIMBS, 1, half, 1)
        tw = jnp.broadcast_to(tw, u.shape)
        v = _k_mont_mul(v, tw)
        return jnp.concatenate(
            [_k_add(u, v), _k_sub(u, v)], axis=2
        ).reshape(NUM_LIMBS, n_t, b)

    return stage


def _pack_stage_twiddles(n_t: int, inverse: bool) -> np.ndarray:
    """(8, n_t) buffer with stage-s twiddles at [half : 2*half]."""
    omega = FieldElement.primitive_nth_root(n_t).value
    if inverse:
        omega = pow(omega, -1, P)
    out = np.zeros((NUM_LIMBS, n_t), dtype=np.uint32)
    length = 2
    while length <= n_t:
        half = length // 2
        w = pow(omega, n_t // length, P)
        out[:, half : 2 * half] = _mont_pack(_power_table(w, half))
        length *= 2
    return out


def _tile_small_twiddles(packed: np.ndarray, b: int, small_halves: int = 4):
    """(8, 2*small_halves, b): rows [half, 2*half) = stage twiddles repeated
    across the batch (for the flattened small stages).  small_halves=4
    keeps this buffer at 8*8*b*4 bytes — the 2^20 kernel block budget sits
    36KB from the 16MB scoped-VMEM limit, so every KB counts; the single
    half=4 stage that now takes the (G, L, B) path pays a small sublane
    pad (4 -> 8) instead."""
    out = np.zeros((NUM_LIMBS, 2 * small_halves, b), dtype=np.uint32)
    half = 1
    while half < small_halves:
        seg = packed[:, half : 2 * half]  # (8, half)
        out[:, half : 2 * half, :] = np.repeat(
            seg[:, :, None], b, axis=2
        )
        half *= 2
    return out


class PallasNTT:
    """Four-step NTT/INTT of size n = R*C with Pallas passes."""

    def __init__(self, n: int, lane_block: int = 128) -> None:
        if n & (n - 1) or n < (1 << 8):
            raise ValueError("size must be a power of two >= 256")
        logn = n.bit_length() - 1
        self.n = n
        self.R = 1 << (logn // 2)
        self.C = n // self.R
        if self.C < lane_block or self.R < 8:
            raise ValueError("size too small for the Pallas four-step path")
        self.lane_block = lane_block
        self.omega = FieldElement.primitive_nth_root(n).value

        self._bitrev_R = jnp.asarray(_bit_reverse_indices(self.R))
        self._bitrev_C = jnp.asarray(_bit_reverse_indices(self.C))
        # stage twiddles + pre-tiled small-stage twiddles as DEVICE arrays
        # (they are threaded into the jitted transforms as arguments, so
        # build them once here rather than as per-trace constants)
        self._tw_R = {}
        self._tw_C = {}
        self._tiled_R = {}
        self._tiled_C = {}
        for inv in (False, True):
            tw_r = _pack_stage_twiddles(self.R, inv)
            tw_c = _pack_stage_twiddles(self.C, inv)
            self._tw_R[inv] = jnp.asarray(tw_r)
            self._tw_C[inv] = jnp.asarray(tw_c)
            self._tiled_R[inv] = jnp.asarray(
                _tile_small_twiddles(tw_r, lane_block)
            )
            self._tiled_C[inv] = jnp.asarray(
                _tile_small_twiddles(tw_c, lane_block)
            )
        self._ones_row = {}  # cache of broadcast-multiplier tables

        # inter-pass twiddle tables W[k1, j2] = omega^{±k1*j2}, built on
        # device eagerly at plan construction (jitted transforms receive
        # them as ARGUMENTS — a 32 MB closure constant at 2^20 bloated
        # every compiled module to ~90 MB; as operands the modules are MBs)
        self._W = {}
        for inv in (False, True):
            self._W[inv] = self._build_w_table(inv)

    # -- table builders ---------------------------------------------------

    def _build_w_table(self, inverse: bool) -> jnp.ndarray:
        base = pow(self.omega, -1, P) if inverse else self.omega
        logc = self.C.bit_length() - 1
        rows = []
        for bit in range(logc):
            step = pow(base, 1 << bit, P)
            rows.append(_mont_pack(_power_table(step, self.R)))
        tables = jnp.asarray(np.stack(rows))  # (logc, 8, R)
        j2 = jnp.arange(self.C, dtype=jnp.uint32)

        @jax.jit
        def build():
            acc = jnp.broadcast_to(
                jnp.asarray(_mont_pack([1]))[:, :, None],
                (NUM_LIMBS, self.R, self.C),
            )
            for bit in range(logc):
                b = (j2 >> bit) & 1
                factor = tables[bit][:, :, None]
                mult = fo.mont_mul(acc, jnp.broadcast_to(factor, acc.shape))
                acc = jnp.where((b == 1)[None, None, :], mult, acc)
            return acc

        return build()

    def _w_table(self, inverse: bool) -> jnp.ndarray:
        return self._W[inverse]

    def _row_col_tables(self, offset: int, inverse: bool):
        """Coset multipliers.

        forward (prologue, pass 1, input index j = j1*C + j2):
            row[j1] = offset^(C*j1)  (bit-reversed to match the permuted
            input), col[j2] = offset^j2
        inverse (epilogue, pass 2, output index k = k1 + R*k2, layout
        (8, k2, k1)):
            row over axis1=k2: (offset^-R)^k2 * 1/n folded in,
            col over lanes=k1: (offset^-1)^k1
        """
        key = (offset % P, inverse)
        if key not in self._ones_row:
            if not inverse:
                row = _power_table(pow(offset, self.C, P), self.R)
                row = [row[i] for i in _bit_reverse_indices(self.R)]
                col = _power_table(offset % P, self.C)
            else:
                inv_off = pow(offset, -1, P)
                n_inv = pow(self.n, -1, P)
                row = _power_table(pow(inv_off, self.R, P), self.C)
                row = [v * n_inv % P for v in row]
                col = _power_table(inv_off, self.R)
            self._ones_row[key] = (_mont_pack(row), _mont_pack(col))
        row_np, col_np = self._ones_row[key]
        return jnp.asarray(row_np), jnp.asarray(col_np)

    # -- kernels ----------------------------------------------------------

    def _pass1(
        self, x: jnp.ndarray, tw, tiled, w_table, prow, pcol,
        apply_pro: bool
    ) -> jnp.ndarray:
        """Column NTTs + coset prologue + W epilogue.
        x: (8, R, C) bit-reversed along axis 1.  Returns A·W (8, R, C).
        ``tw``/``tiled``/``w_table`` are the stage twiddles, pre-tiled
        small-stage twiddles and inter-pass W table (threaded as
        arguments, see class docstring).

        apply_pro=False (forward offset=1 and all inverse transforms, whose
        offset handling lives in pass 2's epilogue) drops the prologue
        multipliers entirely: multiplying by the Montgomery one is the
        identity on canonical values, so skipping is bit-exact and saves
        two full-array mont_muls."""
        r, c, b = self.R, self.C, self.lane_block
        body = _make_small_ntt_body(r, b)

        def stages_and_w(o_ref, tw_ref, tiled_ref, w_ref):
            length = 2
            while length <= r:
                o_ref[...] = body(
                    o_ref[...], tw_ref[...], tiled_ref[...], length
                )
                length *= 2
            # inter-pass twiddle fused as the epilogue (fits under the
            # raised VMEM limit; saves a full HBM round trip vs a
            # separate elementwise pass)
            o_ref[...] = _k_mont_mul(o_ref[...], w_ref[...])

        if apply_pro:
            def kernel(x_ref, prow_ref, pcol_ref, tw_ref, tiled_ref, w_ref, o_ref):
                xv = x_ref[...]
                pr = jnp.broadcast_to(prow_ref[...][:, :, None], xv.shape)
                pc = jnp.broadcast_to(pcol_ref[...][:, None, :], xv.shape)
                o_ref[...] = _k_mont_mul(_k_mont_mul(xv, pr), pc)
                stages_and_w(o_ref, tw_ref, tiled_ref, w_ref)
        else:
            def kernel(x_ref, tw_ref, tiled_ref, w_ref, o_ref):
                o_ref[...] = x_ref[...]
                stages_and_w(o_ref, tw_ref, tiled_ref, w_ref)

        grid = (c // b,)
        data_spec = pl.BlockSpec(
            (NUM_LIMBS, r, b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        row_spec = pl.BlockSpec(
            (NUM_LIMBS, r), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        col_spec = pl.BlockSpec(
            (NUM_LIMBS, b), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        tw_spec = pl.BlockSpec(
            (NUM_LIMBS, r), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tiled_spec = pl.BlockSpec(
            (NUM_LIMBS, 8, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [data_spec]
        operands = [x]
        if apply_pro:
            in_specs += [row_spec, col_spec]
            operands += [prow, pcol]
        in_specs += [tw_spec, tiled_spec, data_spec]
        operands += [tw, tiled, w_table]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, r, c), jnp.uint32),
            grid=grid,
            in_specs=in_specs,
            out_specs=data_spec,
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*operands)

    def _pass2(
        self, y: jnp.ndarray, tw, tiled, erow, ecol, apply_epi: bool
    ) -> jnp.ndarray:
        """Row NTTs (+ optional epilogue row/col multipliers).
        y: (8, C, R) bit-reversed along axis 1.  Returns (8, C, R).

        apply_epi=False (all forward transforms — the coset prologue lives
        in pass 1) drops the epilogue multipliers: bit-exact identity on
        canonical values, two full-array mont_muls saved.  Inverse
        transforms always apply it (it carries 1/n and the coset undo)."""
        r, c, b = self.R, self.C, self.lane_block
        body = _make_small_ntt_body(c, b)

        def stages(o_ref, tw_ref, tiled_ref):
            length = 2
            while length <= c:
                o_ref[...] = body(
                    o_ref[...], tw_ref[...], tiled_ref[...], length
                )
                length *= 2

        if apply_epi:
            def kernel(y_ref, erow_ref, ecol_ref, tw_ref, tiled_ref, o_ref):
                o_ref[...] = y_ref[...]
                stages(o_ref, tw_ref, tiled_ref)
                yv = o_ref[...]
                er = jnp.broadcast_to(erow_ref[...][:, :, None], yv.shape)
                ec = jnp.broadcast_to(ecol_ref[...][:, None, :], yv.shape)
                o_ref[...] = _k_mont_mul(_k_mont_mul(yv, er), ec)
        else:
            def kernel(y_ref, tw_ref, tiled_ref, o_ref):
                o_ref[...] = y_ref[...]
                stages(o_ref, tw_ref, tiled_ref)

        grid = (r // b,)
        data_spec = pl.BlockSpec(
            (NUM_LIMBS, c, b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        row_spec = pl.BlockSpec(
            (NUM_LIMBS, c), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        col_spec = pl.BlockSpec(
            (NUM_LIMBS, b), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        tw_spec = pl.BlockSpec(
            (NUM_LIMBS, c), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tiled_spec = pl.BlockSpec(
            (NUM_LIMBS, 8, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [data_spec]
        operands = [y]
        if apply_epi:
            in_specs += [row_spec, col_spec]
            operands += [erow, ecol]
        in_specs += [tw_spec, tiled_spec]
        operands += [tw, tiled]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, c, r), jnp.uint32),
            grid=grid,
            in_specs=in_specs,
            out_specs=data_spec,
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*operands)

    # -- public -----------------------------------------------------------

    def op_tables(self, inverse: bool, offset: int = 1):
        """Concrete device-array pytree for one transform — everything
        :meth:`apply` reads.  Thread through enclosing jits as an
        ARGUMENT (module-size rationale: see class docstring).  Layout:
        (W, tw_R, tiled_R, tw_C, tiled_C, row, col) with row/col = coset
        prologue tables (forward, offset != 1), epilogue tables
        (inverse; they carry 1/n even at offset 1), or None/None."""
        if inverse:
            row, col = self._row_col_tables(offset, True)
        elif offset % P != 1:
            row, col = self._row_col_tables(offset, False)
        else:
            row = col = None
        return (
            self._w_table(inverse),
            self._tw_R[inverse],
            self._tiled_R[inverse],
            self._tw_C[inverse],
            self._tiled_C[inverse],
            row,
            col,
        )

    def apply(self, a: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
        """Traceable four-step transform reading ONLY ``tables``."""
        w_table, tw_r, tiled_r, tw_c, tiled_c, row, col = tables
        x = a.reshape(NUM_LIMBS, self.R, self.C)
        x = x[:, self._bitrev_R, :]
        apply_pro = not inverse and row is not None
        y = self._pass1(
            x, tw_r, tiled_r, w_table,
            row if apply_pro else None, col if apply_pro else None,
            apply_pro,
        )

        y = jnp.transpose(y, (0, 2, 1))  # (8, C=j2 axis, R=k1 lanes)
        y = y[:, self._bitrev_C, :]
        out = self._pass2(
            y, tw_c, tiled_c,
            row if inverse else None, col if inverse else None,
            apply_epi=inverse,
        )
        # layout (8, k2, k1): natural index k = k1 + R*k2 — plain reshape
        return out.reshape(NUM_LIMBS, self.n)

    def _jitted(self, inverse: bool):
        """One jitted end-to-end transform per direction; jax.jit keys on
        the table pytree STRUCTURE, so plain and coset transforms get
        their own traces while every offset VALUE shares one executable.
        A steady-state call is a single dispatch (bitrev + both Pallas
        passes + transpose fused)."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        if inverse not in cache:
            cache[inverse] = jax.jit(
                lambda a, t: self.apply(a, t, inverse)
            )
        return cache[inverse]

    def forward(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._jitted(False)(a, self.op_tables(False))

    def inverse(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._jitted(True)(a, self.op_tables(True))

    def coset_forward(self, a: jnp.ndarray, offset: int) -> jnp.ndarray:
        if offset % P == 1:
            return self.forward(a)
        return self._jitted(False)(a, self.op_tables(False, offset))

    def coset_inverse(self, a: jnp.ndarray, offset: int) -> jnp.ndarray:
        return self._jitted(True)(a, self.op_tables(True, offset))


@lru_cache(maxsize=8)
def get_pallas_plan(n: int) -> PallasNTT:
    return PallasNTT(n)
