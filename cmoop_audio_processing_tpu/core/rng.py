"""RNG discipline.

The reference uses the global ``random``/``np.random`` with no seeds, so its
runs are irreproducible (SURVEY.md §7 "RNG discipline"). Here every run owns a
single ``RunRng`` that derives named, independent streams:

* ``host``   — ``random.Random`` for the EA bookkeeping (selection, crossover,
  mutation, infill ordering), keeping call-for-call parity with the
  reference's use of the ``random`` module.
* ``numpy``  — ``np.random.Generator`` for candidate batches / LHS.
* ``jax(name)`` — ``jax.random.key`` folded per name for device programs
  (parameter init, dropout, shuffling).

Checkpointable: ``state_dict``/``load_state_dict`` round-trip the host and
numpy stream states so a resumed run continues the same sequence.
"""

from __future__ import annotations

import random
import zlib
from typing import Dict

import numpy as np


def _stable_hash(name: str) -> int:
    return zlib.crc32(name.encode("utf-8"))


class RunRng:
    def __init__(self, seed: int = 0):
        self.seed = int(seed)
        self.host = random.Random(self.seed)
        self.numpy = np.random.default_rng(self.seed + 1)
        self._jax_counter = 0

    def jax(self, name: str = ""):
        """A fresh jax PRNG key; unique per call, stable per (seed, order)."""
        import jax

        self._jax_counter += 1
        base = jax.random.key(self.seed)
        return jax.random.fold_in(
            jax.random.fold_in(base, _stable_hash(name) & 0x7FFFFFFF),
            self._jax_counter,
        )

    def spawn(self, name: str) -> "RunRng":
        """Independent child RNG (e.g. one per generation for device work)."""
        return RunRng(self.seed ^ _stable_hash(name))

    def state_dict(self) -> Dict:
        return {
            "seed": self.seed,
            "host": self.host.getstate(),
            "numpy": self.numpy.bit_generator.state,
            "jax_counter": self._jax_counter,
        }

    def load_state_dict(self, state: Dict) -> None:
        self.seed = state["seed"]
        host_state = state["host"]
        # Tuples survive pickle but JSON round-trips produce lists.
        if isinstance(host_state, list):
            host_state = tuple(
                tuple(s) if isinstance(s, list) else s for s in host_state
            )
        self.host.setstate(host_state)
        self.numpy.bit_generator.state = state["numpy"]
        self._jax_counter = state["jax_counter"]
