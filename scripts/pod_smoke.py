"""Pod-slice smoke jobs — everything gated on real multi-chip hardware.

This dev box has ONE tunneled chip, so two measured claims stay open
(SCALING.md §5, VERDICT r2): the RDMA halo kernels on hardware and the ICI
weak-scaling curve — those jobs print a SKIP record and exit 0 on a single
device (hw_smoke --pod stays green on one chip).  The third job,
spatial8k (the packed spatial env at 8192²), deliberately ALSO runs
single-chip — its per-chip rate is the number pod scaling projects from;
``--quick`` shrinks it to 512² for CPU functional smokes.

  python scripts/pod_smoke.py all [--quick]  # or: rdma | scaling | spatial8k
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _skip(job: str, n: int, need: int = 2) -> None:
    print(json.dumps({"job": job, "skipped": True,
                      "reason": f"needs >= {need} devices, have {n}"}))


def job_rdma(devs) -> None:
    """RDMA halo kernels (parallel/pallas_halo.py) on REAL chips, bit-compared
    against the ppermute tier — the kernels are interpreter-verified only
    until this passes (STATUS 'Known gaps')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from carle_tpu import rules
    from carle_tpu.ops.bitpack import pack_grid, unpack_grid
    from carle_tpu.parallel import (
        bit_spatial_multi_step,
        bit_spatial_multi_step_pallas,
        make_mesh,
        spatial_multi_step,
        spatial_multi_step_pallas,
    )

    n = len(devs)
    mesh = make_mesh(devs, axis_name="space")
    rng = np.random.RandomState(0)
    grid = (rng.rand(1, 64 * n, 256) < 0.3).astype(np.uint8)

    u8_ref = spatial_multi_step(jnp.asarray(grid), rules.LIFE, 8, mesh)
    u8_rdma = spatial_multi_step_pallas(jnp.asarray(grid), rules.LIFE, 8, mesh)
    np.testing.assert_array_equal(np.asarray(u8_rdma), np.asarray(u8_ref))

    packed = pack_grid(jnp.asarray(grid))
    p_ref = bit_spatial_multi_step(packed, rules.LIFE, 8, mesh)
    p_rdma = bit_spatial_multi_step_pallas(packed, rules.LIFE, 8, mesh)
    np.testing.assert_array_equal(
        np.asarray(unpack_grid(p_rdma, grid.shape[-1])),
        np.asarray(unpack_grid(p_ref, grid.shape[-1])),
    )
    print(json.dumps({"job": "rdma", "ok": True, "devices": n,
                      "note": "uint8+packed RDMA halo == ppermute tier"}))


def job_scaling_counts(n_devices: int) -> None:
    """ICI weak scaling (BASELINE row 2: >= 90% linear env-steps/s).
    Runs bench_multichip as a subprocess — the caller must NOT have
    initialized jax (see _probe_device_count)."""
    import subprocess

    counts = [1]
    while counts[-1] * 2 <= n_devices:
        counts.append(counts[-1] * 2)
    cmd = [sys.executable, "bench_multichip.py", "--devices",
           *[str(c) for c in counts]]
    rc = subprocess.run(cmd, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))).returncode
    if rc != 0:
        raise SystemExit(rc)


def job_scaling(devs) -> None:
    job_scaling_counts(len(devs))


def job_spatial8k(devs, size: int = 8192) -> None:
    """Packed spatial ENV at 8192² (SURVEY §2 '>8k² grids'): one wrapped
    env step + a 64-generation free-running burst, with rates.  Runs on a
    SINGLE chip too (mesh=None — the same packed semantics without the
    ring), giving the per-chip rate to project pod scaling from."""
    import jax
    import numpy as np

    from carle_tpu import EnvConfig, rules
    from carle_tpu.mcl.speed import speed_def
    from carle_tpu.parallel import PackedSpatialStack, make_mesh
    from carle_tpu.parallel.packed_env import packed_spatial_sharding
    from carle_tpu.utils.sync import device_sync

    n = len(devs)
    cfg = EnvConfig(height=size, width=size, action_height=64,
                    action_width=64, instances=1)
    mesh = make_mesh(devs, axis_name="space") if n > 1 else None

    STEPS = 64

    def wrapped_rate(defs):
        """Full wrapped env steps, STEPS per launch (one lax.scan — the
        step-at-a-time shell is dispatch-bound through the axon tunnel and
        would measure latency, not compute; inside the scan the obs output
        is also genuinely dead for packed-native wrappers, so the unpack
        DCE is real)."""
        from carle_tpu.rollout import Rollout

        stack = PackedSpatialStack(cfg, defs, mesh)
        ro = Rollout(cfg, stack=stack)
        carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
        if mesh is not None:
            carry = jax.tree.map(
                lambda l: jax.device_put(
                    l, packed_spatial_sharding(mesh, l, cfg)), carry)
        actions = (np.random.RandomState(1).rand(STEPS, 1, 64, 64) < 0.2
                   ).astype(np.uint8)
        carry, rewards = ro.run_actions(carry, actions)   # compile + warm
        device_sync(rewards)
        t0 = time.time()
        carry, rewards = ro.run_actions(carry, actions)
        device_sync(rewards)
        return (time.time() - t0) / STEPS, stack, carry.stack

    dt_env, _, _ = wrapped_rate([speed_def(cfg, reward_scale=1e-2)])
    # packed-native stat wrapper: popcount reductions, obs unpack DCE'd
    from carle_tpu.mcl import speed_def_packed

    dt_env_packed, stack, state = wrapped_rate(
        [speed_def_packed(cfg, reward_scale=1e-2)])

    # LEARNED wrapper (RND online learning) in the spatial env (VERDICT r3
    # item 2).  The fused kernels hold whole-plane blocks in VMEM, so the
    # spatial-fused tier (SpaceSharding halos, parallel/spatial_heads.py)
    # is feasible only when the per-shard padded plane set fits: ~7 f32
    # planes of (H/n + 16) x W need <~100 MB -> n >= H*W*28/1e8 shards
    # (8192² needs >= ~19, i.e. a pod slice; one v5e chip tops out at
    # 512²).  Below the threshold the nets run as XLA convs under GSPMD —
    # same math, reference semantics.
    from carle_tpu.mcl.rnd import rnd2d_def
    from carle_tpu.nets import SpaceSharding

    halo = 8  # RND pools (4, 2)
    shards = 1 if mesh is None else n
    plane_bytes = (size // shards + 2 * halo) * size * 4
    fused_ok = 7 * plane_bytes <= 100 * 2**20 and mesh is not None
    if fused_ok:
        fused_arg = SpaceSharding(mesh)
        learned_size = size
    else:
        # SINGLE-CHIP full-size learned leg via row-band tiling (r5): the
        # encoder runs as a sequential band loop through one kernel call
        # (parallel/band_heads.py), so neither whole VMEM planes (the
        # SpaceSharding bound above) nor the unfused XLA path's
        # 128-lane-padded conv transients (f32[1,4,4096,4096] allocated
        # 8 GB — 32x logical — which OOM'd 4096²+ in r4) are needed.
        # Band height 16 = the measured optimum at 8192 lanes (1.9x over
        # hb=8 — per-band overhead amortizes; hb=32's Mosaic stack
        # exceeds the 112 MB scoped-vmem cap and fails to compile).
        from carle_tpu.nets import BandTiling

        fused_arg = BandTiling(max(size // 16, 1))
        learned_size = size
    lcfg = (cfg if learned_size == size else
            EnvConfig(height=learned_size, width=learned_size,
                      action_height=64, action_width=64, instances=1))
    from carle_tpu.rollout import Rollout

    lstack = PackedSpatialStack(
        lcfg, [rnd2d_def(lcfg, batch_size=64, fused_head=fused_arg)],
        mesh if learned_size == size else None)
    lro = Rollout(lcfg, stack=lstack)
    lcarry = lro.init(jax.random.PRNGKey(0), rules.LIFE)
    if lstack.mesh is not None:
        lcarry = jax.tree.map(
            lambda l: jax.device_put(
                l, packed_spatial_sharding(lstack.mesh, l, lcfg)), lcarry)
    lact = (np.random.RandomState(1).rand(STEPS, 1, 64, 64) < 0.2
            ).astype(np.uint8)
    lcarry, lr_ = lro.run_actions(lcarry, lact)
    device_sync(lr_)
    t0 = time.time()
    lcarry, lr_ = lro.run_actions(lcarry, lact)
    device_sync(lr_)
    dt_env_learned = (time.time() - t0) / STEPS

    free = jax.jit(stack.free_steps, static_argnames=("num_steps",))
    state = free(state, num_steps=64)
    device_sync(state.env.grid)
    t0 = time.time()
    state = free(state, num_steps=64)
    device_sync(state.env.grid)
    dt_free = (time.time() - t0) / 64

    cells = size * size
    print(json.dumps({
        "job": "spatial8k", "devices": n,
        "wrapped_env_cells_per_s": cells / dt_env,
        "wrapped_env_packed_stats_cells_per_s": cells / dt_env_packed,
        "wrapped_env_learned_cells_per_s":
            learned_size * learned_size / dt_env_learned,
        "learned_wrapper_fused": True,
        "learned_wrapper_mode": ("space_sharded" if fused_ok
                                 else "band_tiled"),
        "learned_wrapper_size": learned_size,
        "free_packed_cells_per_s": cells / dt_free,
    }))


JOBS = {"rdma": job_rdma, "scaling": job_scaling, "spatial8k": job_spatial8k}
MIN_DEVICES = {"rdma": 2, "scaling": 2, "spatial8k": 1}


def _probe_device_count(platform) -> int:
    """Count devices WITHOUT initializing the backend in THIS process —
    the scaling job spawns bench_multichip as a subprocess, and on the
    tunneled box a parent that already holds the chip would wedge the
    child silently (CLAUDE.md: only one process may own the chip)."""
    import subprocess

    code = (
        "import jax\n"
        + (f"jax.config.update('jax_platforms', {platform!r})\n"
           if platform else "")
        + "print(len(jax.devices()))"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=300)
    except subprocess.TimeoutExpired:
        # jax.devices() HANGS when the relay is down or another process
        # holds the chip (CLAUDE.md) — a wedged probe must not wedge us
        print(json.dumps({"error": "device probe timed out — relay down "
                          "or chip held by another process"}),
              file=sys.stderr)
        raise SystemExit(2)
    if out.returncode != 0:
        # a broken environment must read as FAILURE, not as an all-skip
        # green run
        print(out.stderr.strip()[-500:], file=sys.stderr)
        raise SystemExit(2)
    return int(out.stdout.strip().splitlines()[-1])


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("job", choices=sorted(JOBS) + ["all"])
    parser.add_argument("--platform", default=None)
    parser.add_argument("--quick", action="store_true",
                        help="small shapes (spatial8k runs at 512² — the "
                             "CPU-friendly functional smoke)")
    args = parser.parse_args()

    n_devices = _probe_device_count(args.platform)
    # subprocess-based jobs FIRST, while this process has not touched the
    # chip; in-process jobs initialize jax afterwards
    order = ["scaling", "rdma", "spatial8k"]
    names = order if args.job == "all" else [args.job]

    for name in names:
        if n_devices < MIN_DEVICES[name]:
            _skip(name, n_devices, MIN_DEVICES[name])
            continue
        if name == "scaling":
            job_scaling_counts(n_devices)
            continue
        import jax

        if args.platform:
            try:
                jax.config.update("jax_platforms", args.platform)
            except Exception:
                pass  # already initialized by a previous in-process job
        from carle_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if name == "spatial8k":
            job_spatial8k(jax.devices(), size=512 if args.quick else 8192)
        else:
            JOBS[name](jax.devices())
    return 0


if __name__ == "__main__":
    sys.exit(main())
