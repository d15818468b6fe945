"""std::mt19937 + std::uniform_real_distribution parity stream.

The reference seeds a per-environment ``std::mt19937`` and draws reset
randomization from ``std::uniform_real_distribution<float>(0, 1)``
(e.g. evo_motion_model/src/env/robot_walk.cpp:21,82-84 and cartpole.cpp:15).
For single-env parity tests we reproduce libstdc++'s exact sequence:
``generate_canonical<float, 24>`` with a 32-bit engine draws one word per
variate and retries on a result that rounds to 1.0.

This is host-side Python (trace-time / test-time only); the batched training
path uses ``jax.random`` instead.
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER_MASK = 0x80000000
_LOWER_MASK = 0x7FFFFFFF


class MT19937:
    """Bit-exact std::mt19937 (the C++11 standard mandates this algorithm)."""

    def __init__(self, seed: int):
        self.mt = np.zeros(_N, dtype=np.uint64)
        self.mt[0] = seed & 0xFFFFFFFF
        for i in range(1, _N):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> np.uint64(30))) + i) & 0xFFFFFFFF
        self.mti = _N

    def _generate(self):
        mt = self.mt.astype(np.uint32)
        for i in range(_N):
            y = (int(mt[i]) & _UPPER_MASK) | (int(mt[(i + 1) % _N]) & _LOWER_MASK)
            nxt = int(mt[(i + _M) % _N]) ^ (y >> 1)
            if y & 1:
                nxt ^= _MATRIX_A
            mt[i] = nxt
        self.mt = mt.astype(np.uint64)
        self.mti = 0

    def next_u32(self) -> int:
        if self.mti >= _N:
            self._generate()
        y = int(self.mt[self.mti])
        self.mti += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF

    def uniform_float(self) -> float:
        """std::uniform_real_distribution<float>(0,1) via libstdc++
        generate_canonical<float, 24>: one 32-bit draw scaled by 2^-32,
        rounded to float32, retried while the result rounds up to 1.0."""
        while True:
            ret = np.float32(np.float32(self.next_u32()) * np.float32(2.0**-32))
            if ret < np.float32(1.0):
                return float(ret)

    def uniform(self, lo: float, hi: float) -> float:
        return float(np.float32(self.uniform_float()) * np.float32(hi - lo) + np.float32(lo))


def reset_draw_table(seed: int, draws_per_reset: int, n_resets: int = 4096) -> np.ndarray:
    """Precompute the env's per-reset U(0,1) draws as a [n_resets, D] table.

    The reference consumes a fixed number of ``rd_uni(rng)`` draws per
    ``reset_engine()`` (robot_walk.cpp:82-84: 3; cartpole.cpp:171: 1;
    cartpole3d.cpp:308-309: 2). Precomputing the stream host-side keeps the
    jitted reset path static while reproducing libstdc++ bit-for-bit; envs
    index the table with a reset counter carried in env state (wrapping at
    n_resets, after which the stream repeats — bump n_resets for longer
    strict-parity runs)."""
    rng = MT19937(seed)
    return np.array(
        [[rng.uniform_float() for _ in range(draws_per_reset)] for _ in range(n_resets)],
        dtype=np.float32,
    )
