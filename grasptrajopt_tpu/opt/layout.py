"""Named block layout: the ABI between user-named values and flat solver
vectors.

Replaces the reference's SXContainer/MXContainer (optas/sx_container.py:18,
mx_container.py:18): an ordered dict of named (rows, cols) blocks with
column-major `vec`/`dict2vec`/`vec2dict` round-trips matching CasADi's
vec() semantics, so solution dictionaries keep the reference's naming
scheme ({model}/{d*}q/x, {model}/{d*}q/p, ...).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp


class BlockLayout:
    def __init__(self):
        self.shapes: "OrderedDict[str, Tuple[int, int]]" = OrderedDict()
        # per-block discreteness (parity: sx_container.py:21-66 is_discrete)
        self.is_discrete: Dict[str, bool] = {}

    def add(self, name: str, rows: int, cols: int = 1, discrete: bool = False) -> None:
        if name in self.shapes:
            raise KeyError(f"block '{name}' already exists")
        self.shapes[name] = (int(rows), int(cols))
        self.is_discrete[name] = bool(discrete)

    def variable_is_discrete(self, name: str) -> None:
        """Mark an existing block as integer-valued
        (parity: sx_container.py:57-63)."""
        if name not in self.shapes:
            raise KeyError(name)
        self.is_discrete[name] = True

    def has_discrete_variables(self) -> bool:
        """Parity: sx_container.py:65-70."""
        return any(self.is_discrete.values())

    def discrete_mask(self) -> np.ndarray:
        """Flat (size,) bool mask over the vec() ordering: True where the
        coordinate belongs to a discrete block."""
        parts = []
        for name, (r, c) in self.shapes.items():
            parts.append(np.full(r * c, self.is_discrete.get(name, False)))
        if not parts:
            return np.zeros(0, dtype=bool)
        return np.concatenate(parts)

    def __contains__(self, name: str) -> bool:
        return name in self.shapes

    def __len__(self) -> int:
        return len(self.shapes)

    @property
    def size(self) -> int:
        return sum(r * c for r, c in self.shapes.values())

    def offset(self, name: str) -> int:
        off = 0
        for n, (r, c) in self.shapes.items():
            if n == name:
                return off
            off += r * c
        raise KeyError(name)

    def vec(self, values: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
        """Flatten a dict of blocks (column-major per block, insertion
        order); missing blocks are zero (the reference's behavior for unset
        parameters)."""
        parts = []
        for name, (r, c) in self.shapes.items():
            if name in values:
                v = jnp.asarray(values[name], dtype).reshape(r, c)
                parts.append(v.T.reshape(-1))  # column-major
            else:
                parts.append(jnp.zeros(r * c, dtype))
        if not parts:
            return jnp.zeros(0, dtype)
        return jnp.concatenate(parts)

    def unvec(self, v) -> Dict[str, jnp.ndarray]:
        v = jnp.asarray(v)
        out: Dict[str, jnp.ndarray] = {}
        off = 0
        for name, (r, c) in self.shapes.items():
            block = v[off : off + r * c].reshape(c, r).T  # column-major
            out[name] = block
            off += r * c
        return out

    def zeros_dict(self, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        return {n: jnp.zeros((r, c), dtype) for n, (r, c) in self.shapes.items()}
