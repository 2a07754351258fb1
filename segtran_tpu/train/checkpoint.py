"""Checkpoint save/load via orbax.

Replaces the reference's torch.save/load_model (reference train2d.py:640-648,
567-638): checkpoints carry {step, params, batch_stats, opt_state?, config
snapshot}; loading validates architecture-defining config keys and aborts on
mismatch (the reference's arg cross-check, train2d.py:584-609), tolerates
missing/extra keys like the reference's merge-into-fresh-state-dict load
(train2d.py:611-628), and the warmup reset after load (train2d.py:630-635) is
the caller's choice via reset_step.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# Config keys that define the architecture; mismatches abort a resume
# (reference train2d.py:584-609 check_arg_consistency).
ARCH_KEYS = (
    "backbone_type", "num_classes", "num_modes", "use_squeezed_transformer",
    "num_attractors", "translayer_dims", "in_fpn_layers", "out_fpn_layers",
    "in_fpn_scheme", "out_fpn_scheme", "pos_code_type", "qk_have_bias",
    "tie_qk_scheme", "mid_type", "trans_output_type", "bb_feat_upsize",
)


def _config_snapshot(cfg) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    return {k: (list(v) if isinstance(v, tuple) else v)
            for k, v in d.items()
            if isinstance(v, (int, float, str, bool, tuple, list, type(None)))}


_async_ckptr = None


def _get_async_ckptr():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves():
    """Block until every async save has committed to disk. Call before
    process exit and before restoring a just-saved checkpoint."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(ckpt_dir: str, step: int, params, batch_stats=None,
                    opt_state=None, cfg=None, async_save: bool = False):
    """async_save=True returns immediately after snapshotting the arrays to
    host; serialization overlaps subsequent train steps (the reference's
    torch.save blocks training for the full write, train2d.py:640-648).
    Callers must wait_for_saves() before exiting or reloading."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    if opt_state is not None:
        payload["opt_state"] = opt_state
    path = os.path.join(ckpt_dir, f"iter_{step}")
    if async_save:
        _get_async_ckptr().save(path, payload, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
    if cfg is not None:
        with open(os.path.join(ckpt_dir, f"iter_{step}.config.json"),
                  "w") as f:
            json.dump({"iter_num": step, "config": _config_snapshot(cfg)}, f,
                      indent=2)
    return path


def check_config_consistency(saved_cfg: Dict[str, Any], cfg,
                             strict: bool = True):
    mismatches = []
    snap = _config_snapshot(cfg)
    for k in ARCH_KEYS:
        if k in saved_cfg and k in snap and saved_cfg[k] != snap[k]:
            mismatches.append((k, saved_cfg[k], snap[k]))
    if mismatches and strict:
        raise ValueError(f"checkpoint/config mismatch: {mismatches}")
    return mismatches


def load_checkpoint(path: str, cfg=None, strict_config: bool = True):
    """Returns the saved payload dict. Validates config if a sidecar config
    snapshot exists and cfg is given."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    cfg_json = path + ".config.json"
    if cfg is not None and os.path.isfile(cfg_json):
        with open(cfg_json) as f:
            saved = json.load(f)
        check_config_consistency(saved.get("config", {}), cfg,
                                 strict_config)
    return payload


def merge_params(target, loaded, rename: Optional[Dict[str, str]] = None):
    """Merge a loaded params tree into a freshly-initialized one: missing keys
    keep their fresh values, extra keys are dropped, legacy names renamed
    (the reference's tolerant load + out_bridgeconv rename,
    test2d.py:506-510)."""
    rename = rename or {}

    def walk(t, l):
        if not isinstance(t, dict):
            return np.asarray(l).astype(np.asarray(t).dtype) \
                if l is not None else t
        out = {}
        for k, v in t.items():
            src_k = rename.get(k, k)
            out[k] = walk(v, l.get(src_k) if isinstance(l, dict) else None)
        return out

    return walk(target, loaded)
