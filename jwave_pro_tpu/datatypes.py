"""Dense/sparse 1D/2D/3D value stores (``jwave/datatypes/`` analogs).

The reference's ``Line/Block/Space`` hierarchy (dense ``*Full`` array stores
vs sparse ``*Hash`` HashMap stores with an alloc/erase lifecycle,
``datatypes/lines/Line.java:36``, ``blocks/Block.java:38``,
``spaces/Space.java:36``) is a half-built "big data" abstraction that the
transform hot path never uses (SURVEY §2.3).  The TPU-native mapping is
direct: dense = ``jnp`` arrays, sparse = ``jax.experimental.sparse.BCOO``.
These thin functional wrappers exist for capability parity and for users
porting code that held ``Line``/``Block``/``Space`` objects.
"""
from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp

__all__ = ["Line", "Block", "Space", "SuperLine"]


@dataclasses.dataclass(frozen=True)
class _Store:
    """Dense offset+size store with get/set (functional: set returns new)."""

    data: jax.Array
    offset: tuple[int, ...]

    @classmethod
    def create(cls, *sizes, offset=None, dtype=jnp.float64):
        off = tuple(offset) if offset else (0,) * len(sizes)
        return cls(jnp.zeros(sizes, dtype=dtype), off)

    @classmethod
    def sparse_create(cls, *sizes, offset=None, dtype=jnp.float64):
        """Sparse variant (*Hash analog) backed by BCOO."""
        from jax.experimental import sparse

        off = tuple(offset) if offset else (0,) * len(sizes)
        empty = sparse.BCOO(
            (jnp.zeros((0,), dtype=dtype),
             jnp.zeros((0, len(sizes)), dtype=jnp.int32)),
            shape=sizes)
        return cls(empty, off)

    def _rel(self, idx):
        return tuple(i - o for i, o in zip(idx, self.offset))

    def get(self, *idx):
        data = self.data
        if hasattr(data, "todense"):
            data = data.todense()
        return data[self._rel(idx)]

    def set(self, *idx_and_value):
        *idx, value = idx_and_value
        data = self.data
        if hasattr(data, "todense"):
            from jax.experimental import sparse

            dense = data.todense().at[self._rel(idx)].set(value)
            return dataclasses.replace(self, data=sparse.BCOO.fromdense(dense))
        return dataclasses.replace(self, data=data.at[self._rel(idx)].set(value))

    @property
    def shape(self):
        return self.data.shape

    def to_array(self):
        data = self.data
        return data.todense() if hasattr(data, "todense") else data


class Line(_Store):
    """1D store (datatypes/lines/Line.java)."""


class Block(_Store):
    """2D store (datatypes/blocks/Block.java)."""


class Space(_Store):
    """3D store (datatypes/spaces/Space.java)."""


@dataclasses.dataclass(frozen=True)
class SuperLine:
    """Windowing container over a long signal (datatypes/SuperLine.java).

    Produces fixed-size windows with hop — the functional analog of the
    reference's windowed iteration."""

    data: jax.Array
    window: int
    hop: int

    def windows(self) -> jax.Array:
        """(num_windows, window) view of the signal."""
        n = self.data.shape[-1]
        num = max(0, (n - self.window) // self.hop + 1)
        idx = (jnp.arange(num)[:, None] * self.hop
               + jnp.arange(self.window)[None, :])
        return self.data[..., idx]
