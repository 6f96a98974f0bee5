"""Shared model-construction helpers."""

from __future__ import annotations

import jax


class FreshKeys:
    """Deterministic fresh-key generator for parameter init: each call
    folds an incrementing counter into the base key. One definition for
    every model tower (any change to key derivation applies everywhere).
    """

    def __init__(self, key: jax.Array):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        self._n += 1
        return jax.random.fold_in(self._key, self._n)
