"""Checkpointing via orbax.

Replaces the reference's torch.save triple (I{iter}_E{epoch}_gen.pth /
_gen_ema.pth / _opt.pth, /root/reference/model/model.py:193-267) with one
orbax directory per tag holding {params, ema_params, opt_state, step}.
`load_for_eval` mirrors the reference behavior of evaluating EMA weights
(model.py:236-239). Released PyTorch checkpoints load through
ucdir_tpu.utils.convert_torch (detected by a .pth suffix or a reference-style
`..._gen.pth` prefix convention).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_state(ckpt_dir: str, tag: str, state) -> str:
    """Save a TrainState under ckpt_dir/tag (overwrites)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    payload = {
        'params': state.params,
        'ema_params': state.ema_params,
        'opt_state': state.opt_state,
        'step': np.asarray(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_state(ckpt_dir_or_path: str, state, tag: Optional[str] = None):
    """Restore into an existing TrainState template (same pytree structure)."""
    ocp = _ocp()
    path = os.path.abspath(ckpt_dir_or_path if tag is None
                           else os.path.join(ckpt_dir_or_path, tag))
    template = {
        'params': state.params,
        'ema_params': state.ema_params,
        'opt_state': state.opt_state,
        'step': np.asarray(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return state.replace(
        params=restored['params'],
        ema_params=restored['ema_params'],
        opt_state=restored['opt_state'],
        step=jax.numpy.asarray(restored['step']))


def load_params_for_eval(resume_state: str, use_ema: bool = True) -> Dict[str, Any]:
    """Resolve an eval checkpoint to a flax params tree.

    Accepts:
      * a reference-style prefix ('.../I_Elatest') — appends '_gen_ema.pth'
        (or '_gen.pth'), converts from torch;
      * a direct .pth path — converts from torch;
      * an orbax checkpoint directory — loads 'ema_params' (or 'params').
    """
    from ucdir_tpu.utils.convert_torch import load_torch_checkpoint
    if resume_state.endswith('.pth'):
        return load_torch_checkpoint(resume_state)
    suffix = '_gen_ema.pth' if use_ema else '_gen.pth'
    if os.path.exists(resume_state + suffix):
        return load_torch_checkpoint(resume_state + suffix)
    # orbax directory: restore as host numpy — the checkpoint may have been
    # written on a different platform/mesh (e.g. saved on TPU, evaluated on a
    # CPU mesh); device placement happens later against the eval mesh
    # (Trainer._current_eval_params).
    ocp = _ocp()
    path = os.path.abspath(resume_state)

    def _np_restore_args(t):
        if isinstance(t, dict):
            return {k: _np_restore_args(v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return [_np_restore_args(v) for v in t]
        return ocp.RestoreArgs(restore_type=np.ndarray)

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        tree = getattr(meta, 'item_metadata', meta)
        tree = getattr(tree, 'tree', tree)
        restored = ckptr.restore(path, restore_args=_np_restore_args(tree))
    key = 'ema_params' if use_ema and 'ema_params' in restored else 'params'
    return restored[key]
