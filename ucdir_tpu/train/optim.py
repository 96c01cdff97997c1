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

import optax


def make_optimizer(optimizer_opt: Dict[str, Any],
                   clip_norm: Optional[float] = None) -> optax.GradientTransformation:
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
    return tx
