"""Checkpointing.

Two artifact kinds, mirroring the reference bundle semantics
(SURVEY.md §5 "Checkpoint / resume"):

1. periodic training ckpt — model, head, logit_scale, optimizer state,
   step, best-records (reference save_model_ckpt, utils/models.py:85-107).
   Unlike the reference (which saves but never restores optimizer state,
   testing.py:76-131), `load_train_ckpt` restores everything.
2. stage-final "best" bundle — best model+head+logit_scale, test acc,
   tau-norm and WiSE-FT artifacts, plus sibling score JSON and confusion
   matrix (reference save_best_model, utils/models.py:110-146).

Serialization: flax msgpack for pytrees + a JSON sidecar for scalars; no
pickle, works for multi-GB trees, and is host-portable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_bundle(path: str, arrays: dict, meta: Optional[dict] = None):
    """arrays: dict of pytrees -> one msgpack file; meta -> sidecar json.
    Template-free serialization (msgpack_serialize) so bundles with
    optional artifacts (tau/WiSE-FT heads) restore without a structure
    template."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_to_host(arrays)))
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=4, default=float)


def load_bundle(path: str, template: dict = None) -> tuple[dict, dict]:
    """Returns (arrays, meta). ``template`` is unused (kept for call-site
    compatibility); restore is template-free."""
    with open(path, "rb") as f:
        arrays = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return arrays, meta


def best_model_path(output_dir: str, stage: int, best_epoch: int) -> str:
    # reference naming: utils/models.py:116
    return os.path.join(
        output_dir, f"stage{stage}_model_best-epoch_{best_epoch}_best.msgpack")


def save_best_model(output_dir: str, stage: int, *, best_records: dict,
                    model_params, head, logit_scale, test_acc: float,
                    best_tau=None, best_tau_test_acc: float = -1,
                    wsft_test_acc: float = -1, best_tau_head=None,
                    wsft_backbone=None, wsft_head=None) -> str:
    """Stage-final bundle (reference utils/models.py:110-146): includes the
    sibling stage{N}_val_scores_best.json and confusion-matrix file."""
    path = best_model_path(output_dir, stage,
                           best_records.get("best_epoch", -1))

    with open(os.path.join(
            output_dir, f"stage{stage}_val_scores_best.json"), "w") as f:
        json.dump(best_records.get("best_scores", {}), f, indent=4,
                  default=float)
    cm = best_records.get("best_confusion_matrix")
    if cm is not None:
        np.save(os.path.join(
            output_dir, f"stage{stage}_val_confusion_matrix_best.npy"), cm)

    arrays = {
        "clip": model_params,
        "head": head,
        "logit_scale": logit_scale,
        "best_tau_head": ({} if best_tau_head is None else
                          {"w": best_tau_head}),
        "wsft_head": {} if wsft_head is None else {"w": wsft_head},
        "wsft_backbone": (wsft_backbone
                          if wsft_backbone is not None else {}),
    }
    meta = {
        "best_val_acc": best_records.get("best_val_acc", -1),
        "best_epoch": best_records.get("best_epoch", -1),
        "best_iter": best_records.get("best_iter", -1),
        "test_acc": round(float(test_acc), 3),
        "best_tau": best_tau,
        "best_tau_test_acc": round(float(best_tau_test_acc), 3),
        "wsft_test_acc": round(float(wsft_test_acc), 3),
    }
    save_bundle(path, arrays, meta)
    return path


def load_best_model(path: str, params_template=None, head_template=None):
    """Returns (model_params, head, logit_scale, meta) with the reference's
    3-format dispatch (testing.py:85-117):

    1. 'clip' + 'head'      — full stage bundle;
    2. 'model'              — visual-tower-only warm start (SupCon-style,
                              strict=False): visual weights replace the
                              template's, text tower + head keep the
                              caller's (zeroshot) values;
    3. 'best_tau_head' only — tau-normalized head into the template head.

    Formats 2/3 keep the caller's logit_scale (ln(100), like the
    reference's zeroshot default).  The tau/WiSE-FT artifacts remain
    available via load_bundle(path)."""
    arrays, meta = load_bundle(path)
    if "clip" in arrays:
        return arrays["clip"], arrays["head"], arrays["logit_scale"], meta
    log100 = float(np.log(100.0))
    if "model" in arrays:
        if params_template is None:
            raise ValueError(f"{path} is a visual-only checkpoint; a "
                             "params template is required")
        visual = arrays["model"].get("visual", arrays["model"])
        params = dict(params_template)
        params["visual"] = visual
        return params, head_template, log100, meta
    tau = arrays.get("best_tau_head")
    if tau:  # non-empty dict/array (save_best_model writes {} when absent)
        if params_template is None:
            raise ValueError(f"{path} is a tau-head-only checkpoint; a "
                             "params template is required")
        head = tau["w"] if isinstance(tau, dict) else tau
        return params_template, head, log100, meta
    raise ValueError(f"no model weights found in {path}: {list(arrays)}")


def save_train_ckpt(ckpt_dir: str, tag: str, state, best_records: dict):
    """Periodic ckpt incl. optimizer state (reference save_model_ckpt).
    Optax states are NamedTuples — converted via to_state_dict first."""
    path = os.path.join(ckpt_dir, f"ckpt_{tag}.msgpack")
    arrays = {
        "model": state.model,
        "head": state.head,
        "logit_scale": state.logit_scale,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": state.step,
    }
    meta = {k: v for k, v in best_records.items()
            if isinstance(v, (int, float, str))}
    save_bundle(path, arrays, meta)
    return path


def load_train_ckpt(path: str, state):
    """Restore a periodic ckpt *including* optimizer state into ``state``
    (the reference saves but never restores it, SURVEY.md §5)."""
    arrays, meta = load_bundle(path)
    opt_state = serialization.from_state_dict(state.opt_state,
                                              arrays["opt_state"])
    new_state = state.replace(
        model=arrays["model"], head=arrays["head"],
        logit_scale=arrays["logit_scale"], opt_state=opt_state,
        step=np.asarray(arrays["step"]))
    return new_state, meta


def save_train_ckpt_orbax(ckpt_dir: str, step: int, state):
    """Orbax backend (SURVEY.md §5 'Rebuild: orbax with the same logical
    bundle') — async-capable StandardCheckpointer keyed by step; msgpack
    bundles remain the default (simpler, single-file, host-portable)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "model": state.model, "head": state.head,
        "logit_scale": state.logit_scale,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": np.asarray(state.step),
    }, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_ckpt_orbax(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "model": state.model, "head": state.head,
        "logit_scale": state.logit_scale,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": np.asarray(state.step),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    opt_state = serialization.from_state_dict(state.opt_state,
                                              restored["opt_state"])
    return state.replace(model=restored["model"], head=restored["head"],
                         logit_scale=restored["logit_scale"],
                         opt_state=opt_state,
                         step=np.asarray(restored["step"]))


def save_test_scores(scores: dict, confusion_matrix, output_dir: str,
                     tag: str, stage: int = 1):
    """reference utils/models.py:149-159 (npy instead of pickle)."""
    with open(os.path.join(output_dir,
                           f"stage{stage}_{tag}_scores.json"), "w") as f:
        json.dump(scores, f, indent=4, default=float)
    if confusion_matrix is not None:
        np.save(os.path.join(
            output_dir, f"stage{stage}_{tag}_confusion_matrix.npy"),
            confusion_matrix)
