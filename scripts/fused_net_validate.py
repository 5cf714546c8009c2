"""Hardware validation of the fully-fused wrapper nets (heads + tails).

Validates, on the live TPU:

1. empirical dropout RATES of the fused head and tail kernels (the
   hardware PRNG path — Mosaic lowers integer compares on the PRNG words
   as SIGNED, so the sign-safe mask in ops/pallas_head.py is load-bearing;
   a raw uint32-threshold compare measured a 0.55 effective drop at p=0.1);
2. forward/loss parity of the full fused AE stack vs the XLA composition;
3. gradient parity of the full fused AE stack AND the full fused RND
   predictor stack against a float64 oracle computed on the host CPU —
   NOT against XLA: on v5e the XLA ConvTranspose2d weight gradient is
   wrong by up to ~6e-2 of leaf scale EVEN under
   ``jax.default_matmul_precision("highest")`` (the transpose-conv dw
   lowers to a conv XLA runs in bf16 regardless), while the fused kernels
   sit at ~1.4e-6.  The oracle errors for both sides are printed so the
   asymmetry stays visible.

Run: PYTHONPATH must include the repo;  ~2 min warm, ~15 min on a cold
compile cache (remote-compile tunnel).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from carle_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from carle_tpu.ops.pallas_head import (make_fused_ae_loss,
                                       make_fused_decoder_loss,
                                       make_fused_encoder,
                                       make_fused_head,
                                       make_fused_loss_tail,
                                       make_fused_tail)
from carle_tpu import nets
from carle_tpu.config import EnvConfig
from carle_tpu.mcl.ae import init_ae_params
from carle_tpu.mcl.rnd import init_predictor_params

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NCHW", "OIHW", "NCHW"))


def conv_hi(x, p, padding):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)), dimension_numbers=DN)
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def deconv_hi(x, p, stride, padding):
    w = jnp.flip(p["w"].astype(x.dtype), (2, 3)).swapaxes(0, 1)
    k = w.shape[2]
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride), dimension_numbers=DN)
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def ref_pool(z, k):
    for _ in range(int(np.log2(k))):
        z = nets.max_pool2(z)
    return z


def check_drop_rates():
    n, cin, cout, h, w = 4, 1, 2, 128, 256
    x = jnp.ones((n, cin, h, w), jnp.float32)
    wt = jnp.full((cout, cin, 3, 3), 0.1, jnp.float32)
    b = jnp.full((cout,), 0.5, jnp.float32)  # pre-act strictly positive
    head = jax.jit(make_fused_head(1, 0.1, train=True))
    out = np.asarray(jax.device_get(head(x, wt, b, jnp.int32(1234))))
    rate = float((out == 0).mean())
    print(f"head drop_rate={rate:.4f} (want ~0.10)", flush=True)
    assert 0.07 < rate < 0.13, rate
    out2 = np.asarray(jax.device_get(head(x, wt, b, jnp.int32(4321))))
    assert (out != out2).any(), "seed-insensitive dropout"

    xi = jnp.ones((n, cin, h // 2, w // 2), jnp.float32)
    wtt = jnp.full((cin, cout, 4, 4), 0.1, jnp.float32)
    tail = jax.jit(make_fused_tail("relu", 0.1, train=True))
    out_t = np.asarray(jax.device_get(tail(xi, wtt, b, jnp.int32(77))))
    rate_t = float((out_t == 0).mean())
    print(f"tail drop_rate={rate_t:.4f} (want ~0.10)", flush=True)
    assert 0.07 < rate_t < 0.13, rate_t


def grads_vs_oracle(name, fused_loss, ref_loss, params):
    """TPU fused grads + TPU XLA grads, then a float64 CPU oracle."""
    with jax.default_matmul_precision("highest"):
        lf, gf = jax.device_get(
            jax.jit(jax.value_and_grad(fused_loss))(params))
        lr, gr = jax.device_get(
            jax.jit(jax.value_and_grad(ref_loss))(params))
    print(f"{name}: loss fused={float(lf):.6f} xla={float(lr):.6f}",
          flush=True)
    assert abs(float(lf) - float(lr)) < 1e-4 * max(1.0, abs(float(lr)))

    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(cpu):
            p64 = jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
            g64 = jax.device_get(jax.grad(ref_loss)(p64))
    finally:
        jax.config.update("jax_enable_x64", False)

    worst_f = worst_x = 0.0
    leaves_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    leaves_x = jax.tree.leaves(gr)
    leaves_o = jax.tree.leaves(g64)
    for (path, a), r, t in zip(leaves_f, leaves_x, leaves_o):
        a, r, t = map(np.asarray, (a, r, t))
        scale = np.abs(t).max() + 1e-30
        ef = np.abs(a - t).max() / scale
        ex = np.abs(r - t).max() / scale
        worst_f, worst_x = max(worst_f, ef), max(worst_x, ex)
        print(f"  {jax.tree_util.keystr(path):24s} fused_err={ef:.2e} "
              f"xla_err={ex:.2e}", flush=True)
    print(f"{name}: worst fused-vs-f64 {worst_f:.2e}; "
          f"worst xla-vs-f64 {worst_x:.2e}", flush=True)
    assert worst_f < 1e-4, worst_f
    return worst_f, worst_x


def check_dropout_grad_alignment():
    """Directional-derivative check with dropout ON: the bwd kernel must
    regenerate the SAME keep masks the fwd drew (same seed, same per-grid-
    step PRNG stream — this is why fwd and bwd must tile instances
    identically; the interpreter stubs the PRNG to zero bits, so only
    hardware can catch a divergence).

    Run in a LINEAR regime — pool=1, positive x/w/b so every kept pre-act
    stays strictly positive and every dropped one is exactly zero: the
    loss is then exactly linear in (w, b) for fixed masks, so the finite
    difference equals <grad, dir> to f32 rounding IF AND ONLY IF the bwd
    masks match the fwd's.  (At pool=2 with random signs, maxpool argmax
    switches inside the ±eps interval make the FD itself ~3% noisy —
    measured on v5e with dropout OFF, where the f64 oracle proves the
    grads exact — so a generic-position FD cannot resolve alignment.)"""
    rng = np.random.RandomState(5)
    n, cin, cout, h, w = 4, 2, 2, 64, 128
    x = jnp.asarray(rng.uniform(0.5, 1.5, (n, cin, h, w)).astype(np.float32))
    co = jnp.asarray(rng.uniform(0.5, 1.5, (n, cout, h, w)).astype(np.float32))
    head = make_fused_head(1, 0.1, train=True, need_dx=True)
    seed = jnp.int32(99)

    def loss(wt, b):
        return (head(x, wt, b, seed) * co).sum()

    wt = jnp.asarray(rng.uniform(0.05, 0.15, (cout, cin, 3, 3))
                     .astype(np.float32))
    b = jnp.asarray(rng.uniform(0.9, 1.1, (cout,)).astype(np.float32))
    gw, gb = jax.jit(jax.grad(loss, argnums=(0, 1)))(wt, b)
    dw = jnp.asarray(rng.uniform(-1, 1, wt.shape).astype(np.float32))
    db = jnp.asarray(rng.uniform(-1, 1, b.shape).astype(np.float32))
    eps = 1e-2  # pre-acts stay > 0.9 - 18*0.0015 — no kink is crossed
    lp = jax.jit(loss)(wt + eps * dw, b + eps * db)
    lm = jax.jit(loss)(wt - eps * dw, b - eps * db)
    fd = (float(lp) - float(lm)) / (2 * eps)
    an = float((gw * dw).sum() + (gb * db).sum())
    rel = abs(fd - an) / (abs(fd) + 1e-9)
    print(f"dropout-on directional derivative (linear regime): fd={fd:.4f} "
          f"grad={an:.4f} rel={rel:.2e}", flush=True)
    # a 1% fwd/bwd mask mismatch would show as ~2e-2 here; f32 rounding
    # and the (measure-zero) kink set sit well under 1e-3
    assert rel < 1e-3, (fd, an)

    # same check for the tail kernel (deconv + dropout + relu, all-positive
    # regime: the deconv's 16 positive taps keep every kept pre-act > 0)
    tail = make_fused_tail("relu", 0.1, train=True)
    xt = jnp.asarray(rng.uniform(0.5, 1.5, (n, cin, h // 2, w // 2))
                     .astype(np.float32))
    cot = jnp.asarray(rng.uniform(0.5, 1.5, (n, cout, h, w))
                      .astype(np.float32))
    wtt = jnp.asarray(rng.uniform(0.05, 0.15, (cin, cout, 4, 4))
                      .astype(np.float32))

    def loss_t(wt_, b_):
        return (tail(xt, wt_, b_, seed) * cot).sum()

    gw, gb = jax.jit(jax.grad(loss_t, argnums=(0, 1)))(wtt, b)
    dwt = jnp.asarray(rng.uniform(-1, 1, wtt.shape).astype(np.float32))
    lp = jax.jit(loss_t)(wtt + eps * dwt, b + eps * db)
    lm = jax.jit(loss_t)(wtt - eps * dwt, b - eps * db)
    fd = (float(lp) - float(lm)) / (2 * eps)
    an = float((gw * dwt).sum() + (gb * db).sum())
    rel = abs(fd - an) / (abs(fd) + 1e-9)
    print(f"tail dropout-on directional derivative: fd={fd:.4f} "
          f"grad={an:.4f} rel={rel:.2e}", flush=True)
    assert rel < 1e-3, (fd, an)

    # same check for the two-stage ENCODER kernel at pools (1,1) — this is
    # the only hardware probe of its stage-1 PRNG REPLAY (the bwd kernel
    # reseeds and redraws the stream to regenerate the stage-1 masks; a
    # replay divergence breaks the FD here and nowhere visible elsewhere).
    # Loss is bilinear in (w1, w2) in the all-positive regime, so central
    # FD is exact up to rounding.
    enc = make_fused_encoder(1, 1, 0.1, train=True)
    xe = jnp.asarray(rng.uniform(0.5, 1.5, (n, cin, h, w))
                     .astype(np.float32))
    coe = jnp.asarray(rng.uniform(0.5, 1.5, (n, cout, h, w))
                      .astype(np.float32))
    w1 = jnp.asarray(rng.uniform(0.05, 0.15, (2, cin, 3, 3))
                     .astype(np.float32))
    b1 = jnp.asarray(rng.uniform(0.9, 1.1, (2,)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(0.05, 0.15, (cout, 2, 3, 3))
                     .astype(np.float32))
    b2 = jnp.asarray(rng.uniform(0.9, 1.1, (cout,)).astype(np.float32))

    ones_e = jnp.ones((h, 1), jnp.float32)  # pools (1,1): all rows real

    def loss_e(w1_, b1_, w2_, b2_):
        return (enc(xe, w1_, b1_, w2_, b2_, seed, ones_e) * coe).sum()

    ge = jax.jit(jax.grad(loss_e, argnums=(0, 1, 2, 3)))(w1, b1, w2, b2)
    dirs = [jnp.asarray(rng.uniform(-1, 1, a.shape).astype(np.float32))
            for a in (w1, b1, w2, b2)]
    lp = jax.jit(loss_e)(*(a + eps * d for a, d in zip((w1, b1, w2, b2), dirs)))
    lm = jax.jit(loss_e)(*(a - eps * d for a, d in zip((w1, b1, w2, b2), dirs)))
    fd = (float(lp) - float(lm)) / (2 * eps)
    an = float(sum((g * d).sum() for g, d in zip(ge, dirs)))
    rel = abs(fd - an) / (abs(fd) + 1e-9)
    print(f"encoder dropout-on directional derivative (PRNG replay): "
          f"fd={fd:.4f} grad={an:.4f} rel={rel:.2e}", flush=True)
    assert rel < 1e-3, (fd, an)


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=64)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--instances", type=int, default=4,
                        help="e.g. --height 512 --width 512 --instances 2 "
                             "validates the geometries the scoped-vmem "
                             "raise (pallas_head._compiler_params) enables")
    args = parser.parse_args()

    print("platform:", jax.devices()[0].platform, flush=True)
    check_drop_rates()
    check_dropout_grad_alignment()

    obs = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3,
        (args.instances, 1, args.height, args.width)).astype(jnp.float32)
    cfg = EnvConfig(height=args.height, width=args.width,
                    instances=args.instances)

    # --- full fused AE stack (2 heads + 2 tails) ---
    ae_params = init_ae_params(jax.random.PRNGKey(0), cfg)
    h1 = make_fused_head(2, 0.0, train=False)
    h2 = make_fused_head(2, 0.0, train=False, need_dx=True)
    t1 = make_fused_tail("relu", 0.0, train=False)
    t2 = make_fused_tail("sigmoid", 0.0, train=False)

    def ae_fused(p):
        z = h1(obs.astype(jnp.float32), p["conv1"]["w"], p["conv1"]["b"],
               jnp.int32(0))
        z = h2(z, p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0))
        z = t1(z, p["deconv1"]["w"], p["deconv1"]["b"], jnp.int32(0))
        z = t2(z, p["deconv2"]["w"], p["deconv2"]["b"], jnp.int32(0))
        return jnp.mean((obs.astype(z.dtype) - z) ** 2)

    def ae_ref(p):
        o = obs.astype(p["conv1"]["w"].dtype)
        z = ref_pool(jax.nn.relu(conv_hi(o, p["conv1"], 1)), 2)
        z = ref_pool(jax.nn.relu(conv_hi(z, p["conv2"], 1)), 2)
        z = jax.nn.relu(deconv_hi(z, p["deconv1"], 2, 1))
        z = jax.nn.sigmoid(deconv_hi(z, p["deconv2"], 2, 1))
        return jnp.mean((o - z) ** 2)

    grads_vs_oracle("AE", ae_fused, ae_ref, ae_params)

    # --- full fused RND predictor stack (2 heads + dense/tanh) ---
    rnd_params = init_predictor_params(jax.random.PRNGKey(1), cfg)
    r1 = make_fused_head(4, 0.0, train=False)
    r2 = make_fused_head(2, 0.0, train=False, need_dx=True)

    def rnd_fused(p):
        z = r1(obs.astype(jnp.float32), p["conv1"]["w"], p["conv1"]["b"],
               jnp.int32(0))
        z = r2(z, p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0))
        z = jnp.tanh(nets.flatten(z) @ p["dense"]["w"].T + p["dense"]["b"])
        return (z ** 2).mean()

    def rnd_ref(p):
        o = obs.astype(p["conv1"]["w"].dtype)
        z = ref_pool(jax.nn.relu(conv_hi(o, p["conv1"], 1)), 4)
        z = ref_pool(jax.nn.relu(conv_hi(z, p["conv2"], 1)), 2)
        z = jnp.tanh(nets.flatten(z) @ p["dense"]["w"].T.astype(o.dtype)
                     + p["dense"]["b"].astype(o.dtype))
        return (z ** 2).mean()

    grads_vs_oracle("RND", rnd_fused, rnd_ref, rnd_params)

    # --- the r4 encoder paths: one-kernel encoder + loss tail, uint8 obs --
    obs_u8 = obs.astype(jnp.uint8)
    enc_ae = make_fused_encoder(2, 2, 0.0, train=False)
    lt = make_fused_loss_tail("sigmoid", 0.0, train=False)

    m_ae = jnp.ones((args.height // 2, 1), jnp.float32)

    def ae_fused_enc(p):
        z = enc_ae(obs_u8, p["conv1"]["w"], p["conv1"]["b"],
                   p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0), m_ae)
        z = t1(z, p["deconv1"]["w"], p["deconv1"]["b"], jnp.int32(0))
        err = lt(z, p["deconv2"]["w"], p["deconv2"]["b"], obs_u8,
                 jnp.int32(0))
        return err.mean() / (obs.shape[1] * obs.shape[2] * obs.shape[3])

    grads_vs_oracle("AE-enc(u8)", ae_fused_enc, ae_ref, ae_params)

    # encoder + BOTH decoder stages + loss in two kernels total (the r4
    # production fused-AE path: nets.conv_encoder + nets.conv_decoder_loss)
    dl = make_fused_decoder_loss(0.0, train=False)

    def ae_fused_dl(p):
        z = enc_ae(obs_u8, p["conv1"]["w"], p["conv1"]["b"],
                   p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0), m_ae)
        err = dl(z, p["deconv1"]["w"], p["deconv1"]["b"],
                 p["deconv2"]["w"], p["deconv2"]["b"], obs_u8, jnp.int32(0))
        return err.mean() / (obs.shape[1] * obs.shape[2] * obs.shape[3])

    grads_vs_oracle("AE-dl(u8)", ae_fused_dl, ae_ref, ae_params)

    # the r5 whole-AE SINGLE kernel (encoder + decoder + loss in ONE
    # pallas_call — the embedding never exists in HBM): all 8 param grads
    # vs the f64 oracle
    ael = make_fused_ae_loss(2, 2, 0.0, train=False)

    def ae_fused_whole(p):
        err = ael(obs_u8, p["conv1"]["w"], p["conv1"]["b"],
                  p["conv2"]["w"], p["conv2"]["b"],
                  p["deconv1"]["w"], p["deconv1"]["b"],
                  p["deconv2"]["w"], p["deconv2"]["b"], obs_u8,
                  jnp.int32(0), m_ae)
        return err.mean() / (obs.shape[1] * obs.shape[2] * obs.shape[3])

    grads_vs_oracle("AE-whole(u8)", ae_fused_whole, ae_ref, ae_params)

    # coarse dropout-replay guard for the whole-AE kernel (its bwd redraws
    # enc1/enc2/decA/decB masks from one stream in forward order; a
    # miscounted draw gives O(1) grad errors).  All-positive regime keeps
    # relu linear; pool-window maxima are generically margin-separated, so
    # a small central FD resolves alignment to ~1e-2 — coarse, but a
    # replay divergence is catastrophic, not subtle.  (The exact p1*p2==4
    # shape rules out the pool=1 linear-regime trick the other kernels use.)
    rng5 = np.random.RandomState(55)
    ael_d = make_fused_ae_loss(2, 2, 0.1, train=True)
    xs = jnp.asarray(rng5.uniform(0.5, 1.5, obs.shape).astype(np.float32))
    pos = {k: {"w": jnp.asarray(rng5.uniform(0.05, 0.15,
                                             np.asarray(v["w"]).shape)
                                .astype(np.float32)),
               "b": jnp.asarray(rng5.uniform(0.9, 1.1,
                                             np.asarray(v["b"]).shape)
                                .astype(np.float32))}
           for k, v in ae_params.items()}

    def loss_whole(p):
        return ael_d(xs, p["conv1"]["w"], p["conv1"]["b"],
                     p["conv2"]["w"], p["conv2"]["b"],
                     p["deconv1"]["w"], p["deconv1"]["b"],
                     p["deconv2"]["w"], p["deconv2"]["b"], xs,
                     jnp.int32(123), m_ae).sum()

    g = jax.jit(jax.grad(loss_whole))(pos)
    dirs = jax.tree.map(
        lambda a: jnp.asarray(rng5.uniform(-1, 1, np.asarray(a).shape)
                              .astype(np.float32)), pos)
    eps = 2e-3
    lp = jax.jit(loss_whole)(jax.tree.map(lambda a, d: a + eps * d, pos,
                                          dirs))
    lm = jax.jit(loss_whole)(jax.tree.map(lambda a, d: a - eps * d, pos,
                                          dirs))
    fd = (float(lp) - float(lm)) / (2 * eps)
    an = float(sum((gg * dd).sum() for gg, dd in
                   zip(jax.tree.leaves(g), jax.tree.leaves(dirs))))
    rel = abs(fd - an) / (abs(fd) + 1e-9)
    print(f"whole-AE dropout-on directional derivative: fd={fd:.4f} "
          f"grad={an:.4f} rel={rel:.2e}", flush=True)
    assert rel < 2e-2, (fd, an)

    enc_rnd = make_fused_encoder(4, 2, 0.0, train=False)

    m_rnd = jnp.ones((args.height // 4, 1), jnp.float32)

    def rnd_fused_enc(p):
        z = enc_rnd(obs_u8, p["conv1"]["w"], p["conv1"]["b"],
                    p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0), m_rnd)
        z = jnp.tanh(nets.flatten(z) @ p["dense"]["w"].T + p["dense"]["b"])
        return (z ** 2).mean()

    grads_vs_oracle("RND-enc(u8)", rnd_fused_enc, rnd_ref, rnd_params)
    print("ALL HARDWARE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
