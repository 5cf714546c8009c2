"""AE2D — autoencoder reconstruction bonus (mcl.py:424-556).

A conv encoder / transpose-conv decoder reconstructs the observation; the
per-instance reconstruction error is the bonus.  Same online-learning loop as
RND2D (inherited there, shared here via mcl/_online.py).

Architecture (mcl.py:452-467), Sequential indices for checkpoint conversion:

  Conv2d(1,4,3,p1)[0] Drop ReLU Pool Conv2d(4,2,3,p1)[4] Drop ReLU Pool
  ConvT(2,1,4,p1,s2)[8] Drop ReLU ConvT(1,1,4,p1,s2)[11] Drop Sigmoid
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .. import nets
from ..config import EnvConfig
from ._online import (
    REFERENCE_EFFECTIVE_LR,
    LearnerState,
    init_learner,
    learner_apply,
    make_optimizer,
    net_input,
)
from .base import WrapperDef, default_on_reset
from .rnd import RND2D, _torch_getter

DROP_P = 0.1
DECLARED_LR = 9e-2  # mcl.py:429 — see _online.py on why it never takes effect


def init_ae_params(key: jax.Array, config: EnvConfig) -> Dict[str, Any]:
    del config  # fully convolutional — shape-independent
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": nets.conv_init(k1, 4, 1, 3),
        "conv2": nets.conv_init(k2, 2, 4, 3),
        "deconv1": nets.conv_transpose_init(k3, 2, 1, 4),
        "deconv2": nets.conv_transpose_init(k4, 1, 1, 4),
    }


def ae_forward(
    params: Dict[str, Any], obs: jax.Array, key: Optional[jax.Array],
    train: bool, compute_dtype=None, fused_head: Any = False,
) -> jax.Array:
    k1, k2, k3, k4 = nets.split_keys(key, 4)
    if fused_head:
        # fused_head may be a Mesh — the kernels are then shard_mapped over
        # the instance batch (nets._shard_fused)
        mesh = None if isinstance(fused_head, bool) else fused_head
        # BOTH encoder stages as ONE Pallas kernel (uint8 obs upcast in
        # VMEM; stage-1 activation/cotangent never in HBM — the r4 512²
        # envs/chip-ladder binders, nets.conv_encoder)
        x = nets.conv_encoder(obs, params["conv1"], params["conv2"], k1,
                              pools=(2, 2), drop_p=DROP_P, train=train,
                              mesh=mesh)
        del k2  # the encoder draws both stages from one stream
        x = nets.conv_tail(x, params["deconv1"], k3, act="relu",
                           drop_p=DROP_P, train=train, mesh=mesh)
        return nets.conv_tail(x, params["deconv2"], k4, act="sigmoid",
                              drop_p=DROP_P, train=train, mesh=mesh)
    else:
        obs = obs.astype(jnp.float32)
        x = nets.conv2d(obs, params["conv1"], padding=1,
                        compute_dtype=compute_dtype)
        x = nets.max_pool2(jax.nn.relu(nets.dropout(x, k1, DROP_P, train)))
        x = nets.conv2d(x, params["conv2"], padding=1,
                        compute_dtype=compute_dtype)
        x = nets.max_pool2(jax.nn.relu(nets.dropout(x, k2, DROP_P, train)))
    x = nets.conv_transpose2d(x, params["deconv1"],
                              compute_dtype=compute_dtype)
    x = jax.nn.relu(nets.dropout(x, k3, DROP_P, train))
    x = nets.conv_transpose2d(x, params["deconv2"],
                              compute_dtype=compute_dtype)
    return jax.nn.sigmoid(nets.dropout(x, k4, DROP_P, train))


def ae2d_def(
    config: EnvConfig,
    reward_scale: float = 1.0,
    batch_size: int = 64,
    lr: Optional[float] = None,
    train: bool = True,
    dropout: Optional[bool] = None,
    compute_dtype=None,
    remat: bool = False,
    fused_head: bool = False,
    whole_ae: bool = True,
    **kwargs: Any,
) -> WrapperDef:
    nets.warn_if_bf16_on_tpu(compute_dtype)
    use_dropout = train if dropout is None else dropout
    opt = make_optimizer(REFERENCE_EFFECTIVE_LR if lr is None else lr)

    def init(key: jax.Array) -> LearnerState:
        return init_learner(
            reward_scale, batch_size, init_ae_params(key, config), {}, opt
        )

    def loss_fn(params, state: LearnerState, ctx):
        obs = net_input(ctx, fused_head)
        if fused_head:
            # the default is the WHOLE autoencoder as ONE kernel
            # (nets.conv_ae_loss): encoder, decoder, and error reduction
            # fused so no activation — not even the pooled embedding —
            # exists in HBM (the r4 envs/chip census priced the embedding's
            # six f32 copies at ~0.75 MB/env, the arena's dominant term).
            # ``whole_ae=False`` keeps the r4 two-kernel composition
            # (conv_encoder + conv_decoder_loss) — measured ~5% faster at
            # SMALL scale (15.3k vs 14.6k env-steps/s at 32x256² on v5e)
            # where memory doesn't bind; the whole-AE default is what
            # reaches 7040 envs/chip at 512².  Same math as the unfused
            # branch: mean over C,H,W (mcl.py:508).
            mesh = None if isinstance(fused_head, bool) else fused_head
            n_elem = ctx.obs.shape[1] * ctx.obs.shape[2] * ctx.obs.shape[3]
            if whole_ae:
                err = nets.conv_ae_loss(obs, params["conv1"],
                                        params["conv2"], params["deconv1"],
                                        params["deconv2"], obs, ctx.key,
                                        pools=(2, 2), drop_p=DROP_P,
                                        train=use_dropout, mesh=mesh)
                return err / jnp.float32(n_elem), state.extra
            k1, k2, k3, k4 = nets.split_keys(ctx.key, 4)
            x = nets.conv_encoder(obs, params["conv1"], params["conv2"], k1,
                                  pools=(2, 2), drop_p=DROP_P,
                                  train=use_dropout, mesh=mesh)
            del k2  # each fused kernel draws its stages from one stream
            err = nets.conv_decoder_loss(x, params["deconv1"],
                                         params["deconv2"], obs, k3,
                                         drop_p=DROP_P, train=use_dropout,
                                         mesh=mesh)
            del k4
            # CELL count from the f32 obs SHAPE (trace-time only — obs may
            # be the packed u32 universe whose last dim is W/32)
            return err / jnp.float32(n_elem), state.extra
        prediction = ae_forward(params, obs, ctx.key, use_dropout,
                                compute_dtype, fused_head)
        # mean over C,H,W (mcl.py:508)
        per_inst = jnp.mean(
            (obs.astype(jnp.float32) - prediction) ** 2, axis=(1, 2, 3))
        return per_inst, state.extra

    def bonus_fn(per_inst, ctx):
        return per_inst[:, None]

    return WrapperDef(
        name="AE2D",
        init=init,
        apply=learner_apply(loss_fn, bonus_fn, opt, train, remat),
        on_reset=default_on_reset,
    )


def ae_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference AE2D ``predictor`` state_dict.  Reference AE2D
    checkpoints nest the inner RND2D under ``env.*`` (see SURVEY.md §5) —
    only top-level ``predictor.*`` keys are read here."""
    g = _torch_getter(state_dict)
    return {
        "conv1": {"w": g("predictor.0.weight"), "b": g("predictor.0.bias")},
        "conv2": {"w": g("predictor.4.weight"), "b": g("predictor.4.bias")},
        "deconv1": {"w": g("predictor.8.weight"), "b": g("predictor.8.bias")},
        "deconv2": {"w": g("predictor.11.weight"), "b": g("predictor.11.bias")},
    }


class AE2D(RND2D):
    my_name = "AE2D"
    learning_rate = REFERENCE_EFFECTIVE_LR

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        self._def_kwargs = dict(kwargs)
        return ae2d_def(self._config, train=self._train, **kwargs)

    def _def_factory(self):
        return ae2d_def

    def load_torch_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self._wstate = self._wstate._replace(
            params=ae_params_from_torch(state_dict)
        )

    load_state_dict = load_torch_state_dict
