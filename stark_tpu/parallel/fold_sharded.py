"""FRI folding on domain-sharded codewords in four-step layout.

A codeword of length n = R*C produced by :class:`ShardedNTT` lives as an
(8, R, C) matrix, row(k1)-sharded, with natural index k = k1 + R*k2.  The
FRI fold pairs k with k + n/2 = k1 + R*(k2 + C/2) — the same k1 — so the
fold is a shard-local elementwise kernel mapping (8, R, C) -> (8, R, C/2)
with ZERO cross-chip traffic.  A cascade of t folds shrinks C by 2^t while
R (and the sharding) stays fixed; only when C reaches 1 does the codeword
need regathering (by then it is tiny).

The fold factor (offset * omega^k)^{-1} separates over the layout:

    (offset * omega^{k1 + R*k2})^{-1}
        = [offset^{-1} * omega^{-k1}]  *  [(omega^{-R})^{k2}]

an outer product of an R-vector and a (C/2)-vector — two small host tables
regardless of n.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS
from jax import shard_map

from ..params import P
from ..ops import field_ops as fo
from ..ops.ntt import _mont_pack, _power_table


@lru_cache(maxsize=128)
def _fold_factor_tables(offset: int, omega: int, r: int, c_half: int):
    """numpy Montgomery tables: row[k1] = offset^-1 * omega^-k1  (8, R),
    col[k2] = omega^{-R*k2}  (8, C/2)."""
    inv_offset = pow(offset, -1, P)
    inv_omega = pow(omega, -1, P)
    row = [v * inv_offset % P for v in _power_table(inv_omega, r)]
    col = _power_table(pow(inv_omega, r, P), c_half)
    return _mont_pack(row), _mont_pack(col)


def fold_matrix_local(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    row_tab: jnp.ndarray,
    col_tab: jnp.ndarray,
    one: jnp.ndarray,
    two_inv: jnp.ndarray,
    k1_offset: jnp.ndarray,
) -> jnp.ndarray:
    """Fold one local shard (8, R_local, C) -> (8, R_local, C/2).

    ``row_tab`` is the full (8, R) table; ``k1_offset`` selects this
    shard's row slice (shards own contiguous k1 ranges)."""
    r_local = x.shape[1]
    c_half = x.shape[2] // 2
    rows = jax.lax.dynamic_slice_in_dim(row_tab, k1_offset, r_local, axis=1)
    inv = fo.mont_mul(rows[:, :, None], col_tab[:, None, :c_half])  # (8,rl,ch)
    ai = fo.mont_mul(alpha[:, None, None], inv)
    u = x[:, :, :c_half]
    v = x[:, :, c_half:]
    left = fo.mont_mul(fo.add(one[:, None, None], ai), u)
    right = fo.mont_mul(fo.sub(one[:, None, None], ai), v)
    return fo.mont_mul(two_inv[:, None, None], fo.add(left, right))


class ShardedFold:
    """Shard-local FRI fold over a row-sharded four-step codeword."""

    def __init__(self, mesh: Mesh, r: int, axis_name: str = None) -> None:
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.r = r
        self.d = mesh.shape[self.axis]

        axis = self.axis
        r_local = r // self.d

        def local(x, a, rt, ct, on, ti):
            me = jax.lax.axis_index(axis)
            return fold_matrix_local(
                x, a[:, 0], rt, ct, on[:, 0], ti[:, 0], me * r_local
            )

        # built ONCE: a fresh shard_map/jit per call would recompile
        # every fold round (jit caches on function identity)
        self._fn = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(
                    PS(None, axis, None),
                    PS(None, None),
                    PS(None, None),
                    PS(None, None),
                    PS(None, None),
                    PS(None, None),
                ),
                out_specs=PS(None, axis, None),
                check_vma=False,
            )
        )

    def __call__(
        self, codeword: jnp.ndarray, alpha: int, offset: int, omega: int
    ) -> jnp.ndarray:
        """(8, R, C) row-sharded Montgomery codeword -> (8, R, C/2).

        alpha/offset/omega are the CURRENT round's plain-int parameters
        (offset and omega square between rounds, exactly as in
        reference: fri.rs:141-142)."""
        c_half = codeword.shape[2] // 2
        row_np, col_np = _fold_factor_tables(
            offset % P, omega % P, self.r, c_half
        )
        return self._fn(
            codeword,
            jnp.asarray(_mont_pack([alpha % P])),
            jnp.asarray(row_np),
            jnp.asarray(col_np),
            jnp.asarray(_mont_pack([1])),
            jnp.asarray(_mont_pack([pow(2, -1, P)])),
        )
