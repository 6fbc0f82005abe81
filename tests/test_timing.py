"""The chained-slope timing protocol (bench/timing.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from bench.timing import opaque_zero, readback_floor_ms, time_chained_ms


def test_opaque_zero_is_zero_for_nonnegative_carries():
    for v in (0, 1, 33101, 2**31 - 1):
        assert int(opaque_zero(jnp.int32(v))) == 0


def test_chained_slope_scales_with_work():
    # A body doing W sorts must time ~W x the 1-sort body; we only assert
    # monotonicity with slack (CI machines are noisy).
    x = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, 1 << 16), jnp.int32)

    def make_body(w):
        def body(carry, arr):
            y = arr.at[0].add(opaque_zero(carry))
            for _ in range(w):
                y = jax.lax.sort(y)
            return carry + y[0]

        return body

    t1 = time_chained_ms(make_body(1), x, k1=1, k2=4, reps=3)
    t8 = time_chained_ms(make_body(8), x, k1=1, k2=4, reps=3)
    assert t1 >= 0 and t8 >= 0
    assert t8 > t1  # 8 sorts strictly slower than 1


def test_readback_floor_nonnegative():
    assert readback_floor_ms(reps=3) >= 0
