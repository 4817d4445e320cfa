"""Domain-sharded NTT via the four-step (Bailey) decomposition.

For n = R * C, view the coefficient vector as an R x C matrix x[j1, j2]
with j = j1*C + j2.  Then with k = k1 + R*k2:

    X[k1 + R*k2] = sum_{j2} [ omega^{j2*k1} * sum_{j1} x[j1,j2] w_R^{j1 k1} ]
                   * w_C^{j2 k2}

i.e.  (1) size-R NTTs down the columns, (2) elementwise twiddle
omega^{k1*j2}, (3) size-C NTTs along the rows, (4) an implicit transpose in
the output indexing.

Sharding layout (one mesh axis, D devices):

* input: (8, R, C) sharded on the C axis — column NTTs are shard-local;
* one `all_to_all` reshards to row-sharded (8, R/D, C) — row NTTs are
  shard-local;
* output stays in "four-step layout": device d holds rows k1 in
  [d*R/D, (d+1)*R/D) of the (R, C) result matrix, where the natural
  codeword index is k = k1 + R*k2.

The single all-to-all is the only cross-chip traffic (n/D elements in and
out per chip per transform) and rides ICI.  Crucially, FRI folding pairs
element k with k + n/2 = k1 + R*(k2 + C/2): the SAME k1 shard — so the
entire FRI fold cascade is shard-local in this layout, and only Merkle
leaf hashing (host-side) needs natural-order gathers.

Twiddle omega^{k1*j2} is built on device from log2(C) precomputed power
tables via the bit decomposition of j2 (a few mont_muls per element, no
O(n) host table).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
from jax import shard_map

from ..field import FieldElement
from ..params import NUM_LIMBS, P
from ..ops import field_ops as fo
from ..ops.ntt import _mont_pack, _power_table, get_plan


def _split(n: int, d: int) -> Tuple[int, int]:
    """Choose R, C with R*C = n, both divisible by d, R as square as
    possible."""
    logn = n.bit_length() - 1
    logd = d.bit_length() - 1
    if (1 << logd) != d:
        raise ValueError("device count must be a power of two")
    logr = max(logn // 2, logd)
    if logn - logr < logd:
        raise ValueError(f"size 2^{logn} too small to shard over {d} devices")
    return 1 << logr, 1 << (logn - logr)


class ShardedNTT:
    """Four-step NTT of size n over a 1-D device mesh."""

    def __init__(self, n: int, mesh: Mesh, axis_name: Optional[str] = None) -> None:
        if n & (n - 1):
            raise ValueError("size must be a power of two")
        self.n = n
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.d = mesh.shape[self.axis]
        self.R, self.C = _split(n, self.d)
        self.omega = FieldElement.primitive_nth_root(n).value

        # shardings for the two matrix layouts
        self.col_sharded = NamedSharding(mesh, PS(None, None, self.axis))  # (8,R,C)
        self.row_sharded = NamedSharding(mesh, PS(None, self.axis, None))  # (8,R,C)

        # bit-decomposition power tables for the twiddle omega^{k1*j2}:
        # A_fwd[b][k1] = omega^{2^b * k1}; inverse uses omega^{-1}
        logc = self.C.bit_length() - 1
        omega_inv = pow(self.omega, -1, P)
        self._tw_fwd = self._bit_tables(self.omega, logc)
        self._tw_inv = self._bit_tables(omega_inv, logc)

        self._fwd = self._build(inverse=False)
        self._inv = self._build(inverse=True)
        self._inv4 = None  # built on first use (inverse_from_fourstep)

    def _bit_tables(self, base: int, logc: int) -> jnp.ndarray:
        """(logc, 8, R) Montgomery tables A[b, :, k1] = base^(2^b * k1)."""
        rows = []
        for b in range(logc):
            step = pow(base, 1 << b, P)
            rows.append(_mont_pack(_power_table(step, self.R)))
        return jnp.asarray(np.stack(rows))  # (logc, 8, R)

    def _twiddle(self, tables: jnp.ndarray, j2_local: jnp.ndarray) -> jnp.ndarray:
        """Montgomery (8, R, C_local) twiddle omega^{k1 * j2} from the bit
        decomposition of global j2."""
        logc = tables.shape[0]
        r = self.R
        c_local = j2_local.shape[0]
        acc = jnp.broadcast_to(
            fo.mont_one(jnp.zeros((NUM_LIMBS, 1, 1), jnp.uint32)),
            (NUM_LIMBS, r, c_local),
        )
        for b in range(logc):
            bit = (j2_local >> b) & 1  # (c_local,)
            factor = tables[b][:, :, None]  # (8, R, 1)
            mult = fo.mont_mul(acc, jnp.broadcast_to(factor, acc.shape))
            acc = jnp.where((bit == 1)[None, None, :], mult, acc)
        return acc

    def _build(self, inverse: bool):
        n, r, c, d, axis = self.n, self.R, self.C, self.d, self.axis
        plan_r = get_plan(r)
        plan_c = get_plan(c)
        tables = self._tw_inv if inverse else self._tw_fwd

        def local_fwd(x):  # x: (8, R, C/d) one shard, column-sharded
            # (1) column NTTs: transform axis R (shard-local)
            x = jnp.moveaxis(x, 1, 2)  # (8, C/d, R)
            x = plan_r.inverse(x) if inverse else plan_r.forward(x)
            x = jnp.moveaxis(x, 2, 1)  # (8, R, C/d)
            # (2) twiddle omega^{±k1*j2}
            me = jax.lax.axis_index(axis)
            j2 = (me * (c // d) + jnp.arange(c // d)).astype(jnp.uint32)
            tw = self._twiddle(tables, j2)
            x = fo.mont_mul(x, tw)
            # (3) reshard: split rows over devices, gather all columns
            x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)
            # (4) now (8, R/d, C): row NTTs (shard-local).  For the inverse
            # transform the two stage INTTs contribute 1/R * 1/C = 1/n, the
            # exact global scaling — nothing further needed.
            x = plan_c.inverse(x) if inverse else plan_c.forward(x)
            return x

        out_spec = PS(None, axis, None)
        fn = shard_map(
            local_fwd,
            mesh=self.mesh,
            in_specs=PS(None, None, axis),
            out_specs=out_spec,
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_inv_from_fourstep(self):
        """Inverse transform taking the FORWARD OUTPUT layout directly.

        ``forward`` maps a natural matrix (j = j1*C + j2, column-sharded)
        to four-step layout (k = k1 + R*k2 at [k1, k2], row-sharded).
        This runs the dataflow in reverse on that layout:

            c[j1, j2] = 1/n * sum_{k1} w_R^{-j1 k1} omega^{-j2 k1}
                            * sum_{k2} X[k1, k2] w_C^{-j2 k2}

        i.e. (1) shard-local INTT_C along k2, (2) twiddle omega^{-k1*j2},
        (3) the single all_to_all back to column sharding, (4) shard-local
        INTT_R along k1 — yielding the natural coefficient matrix
        (column-sharded), the exact inverse of ``forward`` with no extra
        resharding.  Used by the sharded prover's degree probe.
        """
        r, c, d, axis = self.R, self.C, self.d, self.axis
        plan_r = get_plan(r)
        plan_c = get_plan(c)
        omega_inv = pow(self.omega, -1, P)
        # bit tables over j2 for the k1-bit decomposition:
        # B[b][j2] = (omega^-1)^(2^b * j2), shape (logr, 8, C)
        logr = r.bit_length() - 1
        rows = []
        for b in range(logr):
            step = pow(omega_inv, 1 << b, P)
            rows.append(_mont_pack(_power_table(step, c)))
        tables_c = jnp.asarray(np.stack(rows))  # (logr, 8, C)

        def local(x):  # (8, R/d, C) row-sharded four-step layout
            # (1) INTT along k2 (last axis, shard-local)
            x = plan_c.inverse(x)
            # (2) twiddle omega^{-k1 * j2} for this shard's k1 rows
            me = jax.lax.axis_index(axis)
            r_local = r // d
            k1 = (me * r_local + jnp.arange(r_local)).astype(jnp.uint32)
            acc = jnp.broadcast_to(
                fo.mont_one(jnp.zeros((NUM_LIMBS, 1, 1), jnp.uint32)),
                (NUM_LIMBS, r_local, c),
            )
            for b in range(logr):
                bit = (k1 >> b) & 1  # (r_local,)
                factor = tables_c[b][:, None, :]  # (8, 1, C)
                mult = fo.mont_mul(acc, jnp.broadcast_to(factor, acc.shape))
                acc = jnp.where((bit == 1)[None, :, None], mult, acc)
            x = fo.mont_mul(x, acc)
            # (3) reshard: gather all k1, split j2 over devices
            x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)
            # (4) INTT along k1 (axis 1, now full length R, shard-local);
            # the two INTTs contribute 1/C * 1/R = 1/n exactly
            x = jnp.moveaxis(x, 1, 2)  # (8, C/d, R)
            x = plan_r.inverse(x)
            return jnp.moveaxis(x, 2, 1)  # (8, R, C/d)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=PS(None, self.axis, None),
            out_specs=PS(None, None, self.axis),
            check_vma=False,
        )
        return jax.jit(fn)

    # -- public -----------------------------------------------------------

    def inverse_from_fourstep(self, x: jnp.ndarray) -> jnp.ndarray:
        """(8, R, C) row-sharded four-step evaluations (forward's output
        layout) -> (8, R, C) column-sharded natural coefficient matrix
        (j = j1*C + j2 at [j1, j2]); exact inverse of :meth:`forward`."""
        if self._inv4 is None:
            self._inv4 = self._build_inv_from_fourstep()
        return self._inv4(x)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """(8, R, C) column-sharded Montgomery coefficients ->
        (8, R, C) row-sharded evaluations in four-step layout
        (natural index k = k1 + R*k2 for output element [k1, k2])."""
        return self._fwd(x)

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse DFT with the SAME layout contract as :meth:`forward`:
        natural-order input matrix (j = j1*C + j2, column-sharded) ->
        four-step output layout (k = k1 + R*k2 at [k1, k2], row-sharded).

        To round-trip, convert the forward output back to natural order
        first (``from_output_matrix`` / ``to_matrix``) — or stay entirely
        in four-step layout as the FRI pipeline does."""
        return self._inv(x)

    # -- host helpers for layout conversion (testing / hashing) -----------

    def to_matrix(self, vec: np.ndarray) -> np.ndarray:
        """(8, n) natural-order -> (8, R, C) four-step input matrix
        (j = j1*C + j2)."""
        return vec.reshape(NUM_LIMBS, self.R, self.C)

    def from_output_matrix(self, mat: np.ndarray) -> np.ndarray:
        """(8, R, C) four-step output -> (8, n) natural order
        (k = k1 + R*k2 lives at mat[:, k1, k2])."""
        return np.transpose(np.asarray(mat), (0, 2, 1)).reshape(NUM_LIMBS, self.n)

    def shard_input(self, mat) -> jnp.ndarray:
        if all(
            d.process_index == jax.process_index()
            for d in self.mesh.devices.flat
        ):
            return jax.device_put(mat, self.col_sharded)
        # process-spanning mesh: each controller supplies the shards it
        # addresses from its (identical) host copy
        mat = np.asarray(mat)
        return jax.make_array_from_callback(
            mat.shape, self.col_sharded, lambda idx: mat[idx]
        )
