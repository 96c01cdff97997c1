"""Optimizer factory — adamw / adam / lion.

Parity target: /root/reference/model/model.py:78-89 + the hand-written Lion in
/root/reference/utils/util.py:7-68. Hyperparameters pinned to the torch
defaults the reference relies on:
  * AdamW: betas (0.9, 0.999), eps 1e-8, weight_decay 0.01 (torch default —
    optax's default differs, so it is set explicitly);
  * Adam: weight_decay 0;
  * Lion: betas (0.9, 0.99), weight_decay 0 (reference default).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax


def finetune_mask(params, substring: str = 'transformer'):
    """Bool pytree: True for params whose path contains `substring`.

    Mirrors the reference finetune_norm selection (model/model.py:62-77):
    freeze everything, optimize (and zero-init) only parameters whose name
    matches — combined with `optax.masked` and `zero_finetune_params`.
    """
    def name(path):
        return '/'.join(str(getattr(k, 'key', k)) for k in path)

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: substring in name(path), params)
    if not any(jax.tree_util.tree_leaves(mask)):
        raise ValueError(
            "finetune_norm: no parameter path contains '%s'" % substring)
    return mask


def zero_finetune_params(params, mask):
    """Zero the optimized subset (reference: v.data.zero_(), model.py:71)."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda p, m: jnp.zeros_like(p) if m else p, params, mask)


def make_optimizer(optimizer_opt: Dict[str, Any],
                   clip_norm: Optional[float] = None,
                   mask=None) -> optax.GradientTransformation:
    kind = optimizer_opt.get('type', 'adamw')
    lr = float(optimizer_opt.get('lr', 1e-4))
    if kind == 'adamw':
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    elif kind == 'adam':
        tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif kind == 'lion':
        tx = optax.lion(lr, b1=0.9, b2=0.99, weight_decay=0.0)
    else:
        raise NotImplementedError(kind)
    if clip_norm is not None:
        # reference: torch.nn.utils.clip_grad_norm_ before step (model.py:111-112)
        tx = optax.chain(optax.clip_by_global_norm(float(clip_norm)), tx)
    if mask is not None:
        # True -> optimized, False -> hard-frozen (update forced to zero;
        # optax.masked alone would pass raw grads through for frozen leaves)
        labels = jax.tree_util.tree_map(
            lambda m: 'train' if m else 'freeze', mask)
        tx = optax.multi_transform(
            {'train': tx, 'freeze': optax.set_to_zero()}, labels)
    return tx
