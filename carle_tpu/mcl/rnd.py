"""RND2D — random-network-distillation exploration bonus (mcl.py:233-421).

A frozen random CNN maps the observation to a 16-dim embedding; a trainable
predictor chases it.  The per-instance squared embedding error is the bonus,
and the predictor trains online inside the step via 64-step gradient
accumulation + Adam (see mcl/_online.py for the exact correspondence).

Architectures (mcl.py:257-298), torch Sequential indices in brackets for
checkpoint conversion:

  predictor:  Conv2d(1,4,3,p1)[0] Drop ReLU Pool Pool Conv2d(4,1,3,p1)[5]
              Drop ReLU Pool Drop Flatten Linear(HW/64,16)[11] Tanh
  random_net: Conv2d(1,2,3,p1)[0] ReLU Pool Pool Conv2d(2,1,3,p1)[4]
              ReLU Pool Flatten Linear(HW/64,16)[8] Tanh
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
from .base import Motivator, WrapperDef, default_on_reset

RND_DIM = 16
DROP_P = 0.1


def init_predictor_params(key: jax.Array, config: EnvConfig) -> Dict[str, Any]:
    dense_nodes = (config.width // 8) * (config.height // 8)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nets.conv_init(k1, 4, 1, 3),
        "conv2": nets.conv_init(k2, 1, 4, 3),
        "dense": nets.linear_init(k3, RND_DIM, dense_nodes),
    }


def init_random_network_params(key: jax.Array, config: EnvConfig) -> Dict[str, Any]:
    dense_nodes = (config.width // 8) * (config.height // 8)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nets.conv_init(k1, 2, 1, 3),
        "conv2": nets.conv_init(k2, 1, 2, 3),
        "dense": nets.linear_init(k3, RND_DIM, dense_nodes),
    }


def predictor_forward(
    params: Dict[str, Any], obs: jax.Array, key: Optional[jax.Array],
    train: bool, compute_dtype=None, fused_head: Any = False,
) -> jax.Array:
    k1, k2, k3 = nets.split_keys(key, 3)
    if fused_head:
        # fused_head may be a Mesh: the kernels are then shard_mapped over
        # the instance batch (pallas calls are opaque to GSPMD — see
        # nets._shard_fused)
        mesh = None if isinstance(fused_head, bool) else fused_head
        # BOTH conv+drop+relu+pool stages as ONE Pallas kernel: the uint8
        # obs upcasts in VMEM and the stage-1 activation/cotangent never
        # touch HBM (nets.conv_encoder — the r4 envs/chip-ladder binders)
        x = nets.conv_encoder(obs, params["conv1"], params["conv2"], k1,
                              pools=(4, 2), drop_p=DROP_P, train=train,
                              mesh=mesh)
        del k2  # the encoder draws both stages from one stream
    else:
        obs = obs.astype(jnp.float32)
        x = nets.conv2d(obs, params["conv1"], padding=1,
                        compute_dtype=compute_dtype)
        x = jax.nn.relu(nets.dropout(x, k1, DROP_P, train))
        x = nets.max_pool2(nets.max_pool2(x))
        x = nets.conv2d(x, params["conv2"], padding=1,
                        compute_dtype=compute_dtype)
        x = jax.nn.relu(nets.dropout(x, k2, DROP_P, train))
        x = nets.max_pool2(x)
    x = nets.dropout(x, k3, DROP_P, train)
    return jnp.tanh(
        nets.linear(nets.flatten(x), params["dense"],
                    compute_dtype=compute_dtype)
    )


def random_forward(params: Dict[str, Any], obs: jax.Array,
                   compute_dtype=None, fused_head: Any = False) -> jax.Array:
    if fused_head:
        mesh = None if isinstance(fused_head, bool) else fused_head
        # frozen target: forward-only through the one-kernel encoder
        x = nets.conv_encoder(obs, params["conv1"], params["conv2"], None,
                              pools=(4, 2), drop_p=0.0, train=False,
                              mesh=mesh)
    else:
        obs = obs.astype(jnp.float32)
        x = jax.nn.relu(nets.conv2d(obs, params["conv1"], padding=1,
                                    compute_dtype=compute_dtype))
        x = nets.max_pool2(nets.max_pool2(x))
        x = jax.nn.relu(nets.conv2d(x, params["conv2"], padding=1,
                                    compute_dtype=compute_dtype))
        x = nets.max_pool2(x)
    return jnp.tanh(nets.linear(nets.flatten(x), params["dense"],
                                compute_dtype=compute_dtype))


def rnd2d_def(
    config: EnvConfig,
    reward_scale: float = 1.0,
    batch_size: int = 64,
    lr: Optional[float] = None,
    train: bool = True,
    dropout: Optional[bool] = None,
    compute_dtype=None,
    remat: bool = False,
    fused_head: bool = False,
    **kwargs: Any,
) -> WrapperDef:
    # dropout defaults to the train flag; pass dropout=False with train=True
    # to match the reference's "module.eval() but updates still firing"
    # configuration (eval() only disables dropout there)
    nets.warn_if_bf16_on_tpu(compute_dtype)
    use_dropout = train if dropout is None else dropout
    opt = make_optimizer(REFERENCE_EFFECTIVE_LR if lr is None else lr)

    def init(key: jax.Array) -> LearnerState:
        kp, kr = jax.random.split(key)
        return init_learner(
            reward_scale,
            batch_size,
            init_predictor_params(kp, config),
            init_random_network_params(kr, config),
            opt,
        )

    def loss_fn(params, state: LearnerState, ctx):
        # fused kernels take the uint8 cells (upcast in VMEM — DCEs the f32
        # obs from the compiled step); the unfused path keeps float32
        obs = net_input(ctx, fused_head)
        target = random_forward(state.target_params, obs, compute_dtype,
                                fused_head)
        prediction = predictor_forward(params, obs, ctx.key, use_dropout,
                                       compute_dtype, fused_head)
        # mean over the embedding dim (mcl.py:350); target carries no grads
        per_inst = jnp.mean((jax.lax.stop_gradient(target) - prediction) ** 2, axis=1)
        return per_inst, state.extra

    def bonus_fn(per_inst, ctx):
        return per_inst[:, None]

    return WrapperDef(
        name="RND2D",
        init=init,
        apply=learner_apply(loss_fn, bonus_fn, opt, train, remat),
        on_reset=default_on_reset,
    )


def predictor_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference ``predictor`` Sequential state_dict slice."""
    g = _torch_getter(state_dict)
    return {
        "conv1": {"w": g("predictor.0.weight"), "b": g("predictor.0.bias")},
        "conv2": {"w": g("predictor.5.weight"), "b": g("predictor.5.bias")},
        "dense": {"w": g("predictor.11.weight"), "b": g("predictor.11.bias")},
    }


def random_network_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    g = _torch_getter(state_dict)
    return {
        "conv1": {"w": g("random_network.0.weight"), "b": g("random_network.0.bias")},
        "conv2": {"w": g("random_network.4.weight"), "b": g("random_network.4.bias")},
        "dense": {"w": g("random_network.8.weight"), "b": g("random_network.8.bias")},
    }


def _torch_getter(state_dict: Dict[str, Any]):
    import numpy as np

    def get(name: str) -> jax.Array:
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t),
            dtype=jnp.float32,
        )

    return get


class RND2D(Motivator):
    my_name = "RND2D"
    learning_rate = REFERENCE_EFFECTIVE_LR
    rnd_dim = RND_DIM

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        self._def_kwargs = dict(kwargs)
        return rnd2d_def(self._config, train=self._train, **kwargs)

    def _def_factory(self):
        return rnd2d_def

    def _rebuild_mode(self) -> None:
        """Swap the jitted apply between train (accumulate+update, dropout on)
        and eval (get_bonus_only, mcl.py:389-395) keeping the state."""
        new_def = self._def_factory()(
            self._config, train=self._train, **self._def_kwargs
        )
        self._wdef = self._wdef._replace(apply=new_def.apply)
        self._jit_apply = jax.jit(new_def.apply)

    @property
    def updates(self) -> int:
        return int(self._wstate.updates)

    def load_torch_state_dict(self, state_dict: Dict[str, Any]) -> None:
        """Adopt a reference RND2D checkpoint (e.g. evaluation/RND2D_mcl.pt).
        Inner-env conv entries (env.*, inner_env.*) are ignored — the CA
        kernel is a constant here, not a parameter."""
        self._wstate = self._wstate._replace(
            params=predictor_params_from_torch(state_dict),
            target_params=random_network_params_from_torch(state_dict),
        )

    # reference-API alias used by drivers
    load_state_dict = load_torch_state_dict
