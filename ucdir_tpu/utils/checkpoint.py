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


_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        ocp = _ocp()
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves():
    """Block until any in-flight async save commits (called automatically
    before restores; call at end-of-training before process exit)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_state(ckpt_dir: str, tag: str, state, async_save: bool = True) -> str:
    """Save a TrainState under ckpt_dir/tag (overwrites).

    async_save: return as soon as the device->host snapshot is taken; the
    file write proceeds in a background thread (orbax AsyncCheckpointer) so
    the train loop doesn't stall on checkpoint IO (the reference's torch.save
    of the 105M-param triple blocks the loop, model.py:193-222; over a
    tunneled TPU the blocking write costs minutes). A new save, any restore,
    or `wait_for_saves()` barriers on the previous one.
    """
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    payload = {
        'params': state.params,
        'ema_params': state.ema_params,
        'opt_state': state.opt_state,
        'step': np.asarray(state.step),
    }
    if async_save:
        try:
            ckptr = _async_ckptr()
            ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
            return path
        except Exception:  # orbax-version fallback: synchronous save
            pass
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_state(ckpt_dir_or_path: str, state, tag: Optional[str] = None):
    """Restore into an existing TrainState template (same pytree structure)."""
    ocp = _ocp()
    wait_for_saves()
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
    wait_for_saves()
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
