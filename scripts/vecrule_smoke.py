"""Hardware smoke + bench for per-instance rule vectors in the Pallas kernels.

Parity (vs the XLA per-instance engines) and throughput of:
  * packed bit_multi_step_pallas with an [instances] rule vector
  * per-step uint8 ca_step_pallas with an [instances] rule vector

Run on the TPU chip (no args): python scripts/vecrule_smoke.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carle_tpu import rules  # noqa: E402
from carle_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


from carle_tpu.utils.sync import device_sync as _sync  # true axon barrier


def main():
    print("device:", jax.devices()[0])
    from carle_tpu.evaluation.eval import DEFAULT_RULES

    battery = [rules.pack_rule_bits(b, s) for b, s in DEFAULT_RULES]

    # ---- parity: packed kernel, small shape ----
    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid
    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas

    inst, h, w = 8, 256, 256
    key = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(key, (inst, h, w)) < 0.4).astype(jnp.uint8)
    bits = jnp.asarray([battery[i % 5] for i in range(inst)], jnp.int32)
    packed = pack_grid(grid)

    ref = np.asarray(unpack_grid(bit_multi_step(packed, bits, 8), w))
    out = np.asarray(unpack_grid(
        bit_multi_step_pallas(packed, bits, jnp.asarray(8)), w))
    assert (out == ref).all(), "packed vector-rule kernel parity FAILED"
    print("packed vector-rule parity at 8x256x256, 8 gens: OK")

    # ---- parity: per-step uint8 kernel ----
    from carle_tpu import EnvConfig
    from carle_tpu.ops.ca import ca_step_grid, pad_action
    from carle_tpu.ops.pallas_ca import ca_step_pallas

    config = EnvConfig(height=256, width=256, action_height=64,
                       action_width=64, instances=inst)
    action = (jax.random.uniform(jax.random.PRNGKey(1), (inst, 64, 64))
              < 0.1).astype(jnp.uint8)
    ref1 = np.asarray(ca_step_grid(grid ^ pad_action(action, config), bits))
    out1 = np.asarray(ca_step_pallas(grid, action, bits, config=config))
    assert (out1 == ref1).all(), "uint8 vector-rule step kernel parity FAILED"
    print("uint8 per-step vector-rule parity: OK")

    # ---- throughput: packed kernel, bench shape ----
    inst, h, w = 4096, 256, 256
    grid = (jax.random.uniform(jax.random.PRNGKey(2), (inst, h, w))
            < 0.4).astype(jnp.uint8)
    bits_vec = jnp.asarray([battery[i % 5] for i in range(inst)], jnp.int32)
    bits_scalar = jnp.asarray(rules.LIFE, jnp.int32)
    packed = pack_grid(grid)
    steps = jnp.asarray(128, jnp.int32)

    for label, rb in (("scalar", bits_scalar), ("vector", bits_vec)):
        _sync(bit_multi_step_pallas(packed, rb, steps))  # compile + warm
        t0 = time.perf_counter()
        p = packed
        for _ in range(8):
            p = bit_multi_step_pallas(p, rb, steps)
        _sync(p)
        dt = time.perf_counter() - t0
        rate = inst * h * w * 128 * 8 / dt
        print(f"packed rules-as-data ({label}): {rate:.3e} cell-updates/s")


if __name__ == "__main__":
    main()
