"""TrainState: params + EMA shadow + optimizer state, one pytree.

EMA semantics match /root/reference/model/model.py:19-32,118-121:
  * the shadow starts as a copy of the *initial* weights;
  * blending (decay 0.9999) only begins once step > step_start_ema (5000),
    gated per-step, update_every steps apart;
  * evaluation loads the EMA weights (model.py:236-239).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class EMAConfig:
    use: bool = struct.field(pytree_node=False, default=True)
    decay: float = struct.field(pytree_node=False, default=0.9999)
    step_start_ema: int = struct.field(pytree_node=False, default=5000)
    update_ema_every: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema: EMAConfig = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self._update_ema(new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            ema_params=new_ema, opt_state=new_opt_state)

    def _update_ema(self, new_params):
        if not self.ema.use:
            return self.ema_params
        d = self.ema.decay
        # reference gating: self.iter > step_start_ema and iter % every == 0,
        # where iter is the pre-increment step counter (model.py:118-122)
        do = jnp.logical_and(self.step > self.ema.step_start_ema,
                             self.step % self.ema.update_ema_every == 0)
        blend = lambda e, p: jnp.where(do, e * d + (1 - d) * p, e)
        return jax.tree_util.tree_map(blend, self.ema_params, new_params)


def create_train_state(params, tx: optax.GradientTransformation,
                       ema_opt: Optional[Dict[str, Any]] = None) -> TrainState:
    ema_opt = ema_opt or {}
    ema = EMAConfig(
        use=bool(ema_opt.get('use', True)),
        decay=float(ema_opt.get('ema_decay', 0.9999)),
        step_start_ema=int(ema_opt.get('step_start_ema', 5000)),
        update_ema_every=int(ema_opt.get('update_ema_every', 1)),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # always a distinct copy: aliasing params would make jit buffer
        # donation see the same buffer twice
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        opt_state=tx.init(params),
        tx=tx,
        ema=ema,
    )
