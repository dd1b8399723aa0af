"""Checkpointing (C14): orbax save/restore for native checkpoints, plus a
torch ``.pt/.pth`` state-dict importer so reference-format weights load for
parity (the reference stored raw torch checkpoints — ``.gitignore:3-4`` is
the only surviving evidence of its weight format).

Parity-critical layout rules (SURVEY.md §7.3.3 — "the fp32-tolerance clause
fails here first"):

  - Conv2d weight  (O, I, kH, kW)      → flax kernel (kH, kW, I, O)
  - depthwise conv (C, 1, kH, kW)      → flax kernel (kH, kW, 1, C)
  - Conv3d weight  (O, I, kT, kH, kW)  → flax kernel (kT, kH, kW, I, O)
  - Linear weight  (O, I)              → flax kernel (I, O)
  - BatchNorm weight/bias → params.{scale,bias}; running_{mean,var} →
    batch_stats.{mean,var}
  - LSTM: torch gate order i,f,g,o kept verbatim; ``b = bias_ih + bias_hh``
    (our cell applies a single fused bias — mathematically identical).
  - GRU: torch gate order r,z,n kept verbatim; ``bi``/``bh`` stay separate
    because torch applies the reset gate AFTER the hidden matmul.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asltpu.config import (
    I3DConfig,
    MobileNetV2GRUConfig,
    ModelConfig,
    PoseBiLSTMConfig,
    ResNet18TransformerConfig,
    TwoStreamFusionConfig,
)

Variables = Dict[str, Any]


# --------------------------------------------------------------------------
# orbax native checkpoints
# --------------------------------------------------------------------------


def save_variables(directory: str, variables: Variables, step: int = 0) -> str:
    """Save model variables with orbax under ``directory/step``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, str(step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(variables), force=True)
    return path


def restore_variables(directory: str, template: Variables) -> Variables:
    """Restore variables saved by :func:`save_variables`. ``directory`` may
    be the step dir itself or its parent (latest step picked).

    Also accepts TRAINING checkpoints (:func:`save_train_state` layout —
    params/opt_state/step/rng): the model collections are projected out so
    a fine-tuned checkpoint loads directly for inference."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    if not _is_step_dir(path):
        steps = sorted(
            (int(d) for d in os.listdir(path) if d.isdigit()), reverse=True
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        path = os.path.join(path, str(steps[0]))
    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, jax.device_get(template))
        except ValueError:
            pass  # tree-structure mismatch → try train-state projection
    raw = ocp.PyTreeCheckpointer().restore(path)
    out = {}
    for key, tmpl in template.items():
        val = raw.get(key)
        # Presence check must not use bare truthiness: array leaves (rng,
        # a 0-d step) would raise on ambiguous truth / drop a step==0.
        # Absent means: missing, None, or an empty dict collection.
        if val is not None and not (isinstance(val, dict) and not val):
            # Validate structure/shape against the template while casting.
            out[key] = jax.tree.map(
                lambda t, r: jnp.asarray(r, t.dtype), tmpl, val
            )
        else:
            out[key] = tmpl  # e.g. stats absent in the checkpoint
    return out


def _is_step_dir(path: str) -> bool:
    return os.path.basename(path).isdigit() and os.path.isdir(path)


def save_train_state(directory: str, state, keep: int = 3) -> str:
    """Save a TrainState (params + opt + step + RNG — SURVEY.md §5.4) under
    ``directory/<step>``, pruning to the newest ``keep`` step dirs."""
    path = save_variables(directory, _state_to_tree(state), int(state.step))
    if keep > 0:
        import shutil

        steps = sorted(
            (int(d) for d in os.listdir(directory) if d.isdigit()),
            reverse=True,
        )
        for old in steps[keep:]:
            shutil.rmtree(os.path.join(directory, str(old)), ignore_errors=True)
    return path


def try_restore_train_state(directory: str, state):
    """Resume from the latest step under ``directory`` if one exists, else
    return ``state`` unchanged (fresh run)."""
    if not os.path.isdir(directory):
        return state
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    if not steps:
        return state
    tree = restore_variables(
        os.path.join(directory, str(max(steps))), _state_to_tree(state)
    )
    return state.replace(**tree)


_BEST_METRIC_FILE = "best_metric.json"


def save_best_state(
    directory: str, state, metric: float, metric_name: str = "eval_top1"
) -> bool:
    """Model selection (SURVEY.md §5.4): keep ``directory/best/`` = the
    train state with the HIGHEST ``metric`` seen so far, with the metric
    recorded beside it. Strictly-greater replaces, so ties keep the
    earliest (fewest-steps) checkpoint. The comparison reads the previous
    best from disk, not memory — a resumed run never overwrites a better
    checkpoint from before the restart with a worse later one.

    ``directory/best/`` has the :func:`save_train_state` layout (one step
    dir), so :func:`restore_variables` loads it directly for inference via
    the train-state projection. Returns True when this state became the
    new best."""
    import json
    import shutil

    best_dir = os.path.join(directory, "best")
    prev = load_best_metric(directory)
    if prev is not None and prev["metric"] >= metric:
        return False
    step = int(state.step)
    save_variables(best_dir, _state_to_tree(state), step)
    for d in os.listdir(best_dir):
        if d.isdigit() and int(d) != step:
            shutil.rmtree(os.path.join(best_dir, d), ignore_errors=True)
    # Write-then-rename: a crash mid-write must not leave a best/ whose
    # recorded metric is garbage (a missing/unreadable file just means the
    # next eval re-claims best, which is safe).
    tmp = os.path.join(best_dir, _BEST_METRIC_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"metric": float(metric), "metric_name": metric_name,
             "step": step},
            f,
        )
    os.replace(tmp, os.path.join(best_dir, _BEST_METRIC_FILE))
    return True


def load_best_metric(directory: str) -> Optional[Dict[str, Any]]:
    """The ``{"metric", "metric_name", "step"}`` record of
    ``directory/best/``, or None if no (readable) best exists."""
    import json

    p = os.path.join(directory, "best", _BEST_METRIC_FILE)
    try:
        with open(p) as f:
            rec = json.load(f)
        # Parseable-but-wrong-shape records (a torn write predating the
        # write-then-rename, hand edits) must also read as "no best" —
        # callers index rec["metric"] unguarded.
        if not isinstance(rec, dict) or not isinstance(
            rec.get("metric"), (int, float)
        ):
            return None
        return rec
    except (OSError, ValueError):
        return None


_DATA_STATE_FILE = "grain_state.bin"


def save_data_state(directory: str, step: int, state_bytes: bytes) -> None:
    """Persist the input-pipeline (grain iterator) state next to the train
    state for the same step — SURVEY.md §5.4 resume semantics include the
    data stream position, not just model state."""
    step_dir = os.path.join(directory, str(step))
    os.makedirs(step_dir, exist_ok=True)
    with open(os.path.join(step_dir, _DATA_STATE_FILE), "wb") as f:
        f.write(state_bytes)


def load_data_state(directory: str) -> Optional[bytes]:
    """Input-pipeline state of the LATEST checkpoint step, if saved."""
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        (int(d) for d in os.listdir(directory) if d.isdigit()), reverse=True
    )
    for s in steps:
        p = os.path.join(directory, str(s), _DATA_STATE_FILE)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return f.read()
        break  # only the latest step may match the restored train state
    return None


def _state_to_tree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }


# --------------------------------------------------------------------------
# torch state-dict import
# --------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def conv2d_kernel(w) -> np.ndarray:
    # OIHW → HWIO; the depthwise case (C,1,kH,kW) → (kH,kW,1,C) falls out
    # of the same permutation (flax feature_group_count convention).
    return _t(w).transpose(2, 3, 1, 0)


def conv3d_kernel(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 4, 1, 0)  # OIDHW → DHWIO


def linear_kernel(w) -> np.ndarray:
    return _t(w).T  # (O,I) → (I,O)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (handles both bare
    state dicts and {"state_dict": ...} wrappers)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _t(v) for k, v in obj.items()}


def _set(tree: Dict, flax_path: str, value: np.ndarray):
    """Set ``tree[a][b][...] = value`` for 'a/b/...' path, validating shape
    against the initialized template."""
    keys = flax_path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    old = node[keys[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {flax_path}: template {tuple(old.shape)} vs "
            f"import {tuple(value.shape)}"
        )
    # HOST-side assign: the import functions mutate a numpy mirror and the
    # finished tree uploads ONCE (packed) — a jnp.asarray here costs one
    # device round-trip per parameter, the exact per-leaf-RPC pattern
    # api.packed_device_put exists to avoid (seconds each on a throttled
    # relay link; README "known environment limits").
    node[keys[-1]] = np.asarray(value, dtype=old.dtype)


def _import_convbn(
    params: Dict, stats: Dict, flax_prefix: str,
    sd: Dict[str, np.ndarray], conv_key: str, bn_key: str, conv3d: bool = False,
):
    kernel = conv3d_kernel(sd[conv_key + ".weight"]) if conv3d else conv2d_kernel(
        sd[conv_key + ".weight"]
    )
    _set(params, f"{flax_prefix}/conv/kernel", kernel)
    if conv_key + ".bias" in sd:
        _set(params, f"{flax_prefix}/conv/bias", sd[conv_key + ".bias"])
    _set(params, f"{flax_prefix}/bn/scale", sd[bn_key + ".weight"])
    _set(params, f"{flax_prefix}/bn/bias", sd[bn_key + ".bias"])
    _set(stats, f"{flax_prefix}/bn/mean", sd[bn_key + ".running_mean"])
    _set(stats, f"{flax_prefix}/bn/var", sd[bn_key + ".running_var"])


def import_mobilenetv2(
    sd: Dict[str, np.ndarray], variables: Variables, prefix: str = "backbone"
) -> Variables:
    """torchvision ``mobilenet_v2`` state dict → our MobileNetV2 names.

    torchvision layout: features.0 stem; features.1..17 inverted residuals
    (t=1 block: conv.0 depthwise + conv.1/2 project; t=6 blocks: conv.0
    expand, conv.1 depthwise, conv.2/3 project); features.18 head.
    """
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p, s = variables["params"], variables["batch_stats"]
    pre = f"{prefix}/" if prefix else ""
    _import_convbn(p, s, f"{pre}stem", sd, "features.0.0", "features.0.1")
    for i in range(1, 18):
        blk = f"{pre}block{i - 1}"
        first = f"features.{i}.conv"
        if f"{first}.3.weight" in sd:  # expand_ratio != 1
            _import_convbn(p, s, f"{blk}/expand", sd, f"{first}.0.0", f"{first}.0.1")
            _import_convbn(p, s, f"{blk}/depthwise", sd, f"{first}.1.0", f"{first}.1.1")
            _import_convbn(p, s, f"{blk}/project", sd, f"{first}.2", f"{first}.3")
        else:  # expand_ratio == 1 (block features.1)
            _import_convbn(p, s, f"{blk}/depthwise", sd, f"{first}.0.0", f"{first}.0.1")
            _import_convbn(p, s, f"{blk}/project", sd, f"{first}.1", f"{first}.2")
    _import_convbn(p, s, f"{pre}head", sd, "features.18.0", "features.18.1")
    return variables  # HOST tree; consumers upload once (packed)


def import_resnet18(
    sd: Dict[str, np.ndarray], variables: Variables, prefix: str = "backbone"
) -> Variables:
    """torchvision ``resnet18`` state dict → our ResNet18 names."""
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p, s = variables["params"], variables["batch_stats"]
    pre = f"{prefix}/" if prefix else ""
    _import_convbn(p, s, f"{pre}stem", sd, "conv1", "bn1")
    for stage in range(1, 5):
        for blk in range(2):
            t = f"layer{stage}.{blk}"
            f = f"{pre}layer{stage}_{blk}"
            _import_convbn(p, s, f"{f}/conv1", sd, f"{t}.conv1", f"{t}.bn1")
            _import_convbn(p, s, f"{f}/conv2", sd, f"{t}.conv2", f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                _import_convbn(
                    p, s, f"{f}/downsample", sd,
                    f"{t}.downsample.0", f"{t}.downsample.1",
                )
    return variables  # HOST tree; consumers upload once (packed)


def import_torch_rnn(
    sd: Dict[str, np.ndarray],
    variables: Variables,
    rnn_prefix: str,
    flax_prefix: str,
    num_layers: int,
    bidirectional: bool,
    cell: str,  # "lstm" | "gru"
) -> Variables:
    """torch nn.LSTM/nn.GRU parameters → our scan-cell parameter names."""
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p = variables["params"]
    for node in flax_prefix.split("/"):
        if node:
            p = p[node]
    directions = ["fwd", "bwd"] if bidirectional else [""]
    for layer in range(num_layers):
        for d_i, d in enumerate(directions):
            sfx = "_reverse" if d_i == 1 else ""
            wi = linear_kernel(sd[f"{rnn_prefix}weight_ih_l{layer}{sfx}"])
            wh = linear_kernel(sd[f"{rnn_prefix}weight_hh_l{layer}{sfx}"])
            bi = sd[f"{rnn_prefix}bias_ih_l{layer}{sfx}"]
            bh = sd[f"{rnn_prefix}bias_hh_l{layer}{sfx}"]
            tag = f"l{layer}_{d}_" if d else f"l{layer}_"
            if cell == "lstm":
                _assign(p, tag + "wi", wi)
                _assign(p, tag + "wh", wh)
                _assign(p, tag + "b", bi + bh)
            else:
                _assign(p, tag + "wi", wi)
                _assign(p, tag + "wh", wh)
                _assign(p, tag + "bi", bi)
                _assign(p, tag + "bh", bh)
    return variables  # HOST tree; consumers upload once (packed)


def _assign(node: Dict, key: str, value: np.ndarray):
    old = node[key]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {key}: {tuple(old.shape)} vs {tuple(value.shape)}"
        )
    # HOST-side, like _set: the RNN imports otherwise pay one device RPC
    # per wi/wh/bi/bh leaf, defeating the single packed upload.
    node[key] = np.asarray(value, dtype=old.dtype)


def import_transformer_head(
    sd: Dict[str, np.ndarray],
    variables: Variables,
    flax_prefix: str,
    num_layers: int,
    num_heads: int,
) -> Variables:
    """torch transformer-encoder twin → our TransformerHead names.

    Expected torch naming: ``cls``, ``pos``, optional ``in_proj`` Linear,
    ``layers.{i}.{ln1,ln2}`` LayerNorms, ``layers.{i}.attn`` a
    ``nn.MultiheadAttention`` (batch_first), ``layers.{i}.{mlp1,mlp2}``
    Linears, ``final_ln``, ``fc``.

    MHA mapping: ``in_proj_weight [3d, d]`` rows are q;k;v — each maps to a
    flax kernel ``[d, heads, head_dim]`` via transpose+reshape;
    ``out_proj.weight [d, d]`` maps to ``[heads, head_dim, d]``.
    """
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p = variables["params"]
    for node in flax_prefix.split("/"):
        if node:
            p = p[node]
    d = sd["final_ln.weight"].shape[0]
    hd = d // num_heads

    def set_(path, val):
        _set(p, path, val)

    set_("cls", sd["cls"])
    set_("pos", sd["pos"])
    if "in_proj.weight" in sd:
        set_("in_proj/kernel", linear_kernel(sd["in_proj.weight"]))
        set_("in_proj/bias", sd["in_proj.bias"])
    for i in range(num_layers):
        t = f"layers.{i}"
        set_(f"layer{i}/ln1/scale", sd[f"{t}.ln1.weight"])
        set_(f"layer{i}/ln1/bias", sd[f"{t}.ln1.bias"])
        set_(f"layer{i}/ln2/scale", sd[f"{t}.ln2.weight"])
        set_(f"layer{i}/ln2/bias", sd[f"{t}.ln2.bias"])
        w = sd[f"{t}.attn.in_proj_weight"]  # [3d, d]
        bqkv = sd[f"{t}.attn.in_proj_bias"]  # [3d]
        for j, name in enumerate(["query", "key", "value"]):
            set_(f"layer{i}/attn/{name}/kernel",
                 w[j * d : (j + 1) * d].T.reshape(d, num_heads, hd))
            set_(f"layer{i}/attn/{name}/bias",
                 bqkv[j * d : (j + 1) * d].reshape(num_heads, hd))
        ow = sd[f"{t}.attn.out_proj.weight"]  # [d, d]
        set_(f"layer{i}/attn/out/kernel", ow.T.reshape(num_heads, hd, d))
        set_(f"layer{i}/attn/out/bias", sd[f"{t}.attn.out_proj.bias"])
        set_(f"layer{i}/mlp1/kernel", linear_kernel(sd[f"{t}.mlp1.weight"]))
        set_(f"layer{i}/mlp1/bias", sd[f"{t}.mlp1.bias"])
        set_(f"layer{i}/mlp2/kernel", linear_kernel(sd[f"{t}.mlp2.weight"]))
        set_(f"layer{i}/mlp2/bias", sd[f"{t}.mlp2.bias"])
    set_("final_ln/scale", sd["final_ln.weight"])
    set_("final_ln/bias", sd["final_ln.bias"])
    set_("fc/kernel", linear_kernel(sd["fc.weight"]))
    set_("fc/bias", sd["fc.bias"])
    return variables  # HOST tree; consumers upload once (packed)


def _import_mha(
    p: Dict, flax_prefix: str, sd: Dict[str, np.ndarray], torch_prefix: str,
    num_heads: int,
):
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention."""
    w = sd[f"{torch_prefix}.in_proj_weight"]
    bqkv = sd[f"{torch_prefix}.in_proj_bias"]
    d = w.shape[1]
    hd = d // num_heads
    for j, name in enumerate(["query", "key", "value"]):
        _set(p, f"{flax_prefix}/{name}/kernel",
             w[j * d : (j + 1) * d].T.reshape(d, num_heads, hd))
        _set(p, f"{flax_prefix}/{name}/bias",
             bqkv[j * d : (j + 1) * d].reshape(num_heads, hd))
    _set(p, f"{flax_prefix}/out/kernel",
         sd[f"{torch_prefix}.out_proj.weight"].T.reshape(num_heads, hd, d))
    _set(p, f"{flax_prefix}/out/bias", sd[f"{torch_prefix}.out_proj.bias"])


def import_two_stream(
    sd: Dict[str, np.ndarray], variables: Variables, num_layers: int,
    num_heads: int,
) -> Variables:
    """Two-stream fusion twin → our TwoStreamFusion names. Expected torch
    naming: ``features.*`` (torchvision MobileNetV2 layout for the RGB
    backbone), ``rgb_proj``/``kp_proj``/``fc`` Linears, ``pos``,
    ``fusion.{i}.{a_from_b,b_from_a}_{lnq,lnkv,attn}`` and
    ``fusion.{i}.{a,b}_mlp_{ln,fc1,fc2}``."""
    variables = import_mobilenetv2(sd, variables, prefix="rgb_backbone")
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p = variables["params"]
    _set(p, "pos", sd["pos"])
    for name in ["rgb_proj", "kp_proj", "fc"]:
        _set(p, f"{name}/kernel", linear_kernel(sd[f"{name}.weight"]))
        _set(p, f"{name}/bias", sd[f"{name}.bias"])
    for i in range(num_layers):
        t = f"fusion.{i}"
        f = f"fusion{i}"
        for d_ in ["a_from_b", "b_from_a"]:
            for ln in ["lnq", "lnkv"]:
                _set(p, f"{f}/{d_}_{ln}/scale", sd[f"{t}.{d_}_{ln}.weight"])
                _set(p, f"{f}/{d_}_{ln}/bias", sd[f"{t}.{d_}_{ln}.bias"])
            _import_mha(p, f"{f}/{d_}_attn", sd, f"{t}.{d_}_attn", num_heads)
        for s_ in ["a_mlp", "b_mlp"]:
            _set(p, f"{f}/{s_}_ln/scale", sd[f"{t}.{s_}_ln.weight"])
            _set(p, f"{f}/{s_}_ln/bias", sd[f"{t}.{s_}_ln.bias"])
            for fc in ["fc1", "fc2"]:
                _set(p, f"{f}/{s_}_{fc}/kernel",
                     linear_kernel(sd[f"{t}.{s_}_{fc}.weight"]))
                _set(p, f"{f}/{s_}_{fc}/bias", sd[f"{t}.{s_}_{fc}.bias"])
    return variables  # HOST tree; consumers upload once (packed)


def import_i3d(
    sd: Dict[str, np.ndarray], variables: Variables
) -> Variables:
    """pytorch-i3d layout (``Conv3d_1a_7x7.conv3d.weight``,
    ``Mixed_3b.b0.…``, ``logits.conv3d.…``) → our I3D names."""
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    p, s = variables["params"], variables["batch_stats"]

    def unit(flax_name: str, torch_name: str):
        _import_convbn(
            p, s, f"{flax_name}/unit", sd,
            f"{torch_name}.conv3d", f"{torch_name}.bn", conv3d=True,
        )

    unit("Conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit("Conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit("Conv3d_2c_3x3", "Conv3d_2c_3x3")
    for mixed in ["3b", "3c", "4b", "4c", "4d", "4e", "4f", "5b", "5c"]:
        for br in ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]:
            unit(f"Mixed_{mixed}/{br}", f"Mixed_{mixed}.{br}")
    if "logits.conv3d.weight" in sd:
        w = sd["logits.conv3d.weight"]  # (C, 1024, 1, 1, 1)
        _set(p, "logits/kernel", w.reshape(w.shape[0], w.shape[1]).T)
        _set(p, "logits/bias", sd["logits.conv3d.bias"])
    return variables  # HOST tree; consumers upload once (packed)


def load_torch_checkpoint(
    path: str, variables: Variables, cfg: ModelConfig
) -> Variables:
    """Dispatch the torch import by model config.

    The per-family import functions build a HOST (numpy) tree; this entry
    point performs the one packed upload, so a torch-checkpoint load costs
    O(dtypes) device round-trips instead of one per parameter (the relay
    link makes per-leaf transfers seconds each when throttled — see
    api.packed_device_put)."""
    from asltpu.api import packed_device_put

    return packed_device_put(_load_torch_host(path, variables, cfg))


def _load_torch_host(
    path: str, variables: Variables, cfg: ModelConfig
) -> Variables:
    sd = load_state_dict(path)
    if isinstance(cfg, MobileNetV2GRUConfig):
        v = import_mobilenetv2(sd, variables, prefix="backbone")
        v = import_torch_rnn(
            {k.removeprefix("gru."): x for k, x in sd.items() if k.startswith("gru.")},
            v, "", "head", cfg.gru_layers, False, "gru",
        )
        if "fc.weight" in sd:
            v = _import_linear(sd, v, "fc", "head/fc")
        return v
    if isinstance(cfg, ResNet18TransformerConfig):
        v = import_resnet18(sd, variables, prefix="backbone")
        head_sd = {
            k.removeprefix("head."): x for k, x in sd.items()
            if k.startswith("head.")
        }
        if head_sd:
            v = import_transformer_head(
                head_sd, v, "head", cfg.num_tx_layers, cfg.num_heads
            )
        return v
    if isinstance(cfg, PoseBiLSTMConfig):
        v = import_torch_rnn(
            {k.removeprefix("lstm."): x for k, x in sd.items() if k.startswith("lstm.")},
            variables, "", "", cfg.num_layers, True, "lstm",
        )
        if "fc.weight" in sd:
            v = _import_linear(sd, v, "fc", "fc")
        return v
    if isinstance(cfg, I3DConfig):
        return import_i3d(sd, variables)
    if isinstance(cfg, TwoStreamFusionConfig):
        return import_two_stream(
            sd, variables, cfg.num_fusion_layers, cfg.num_heads
        )
    raise NotImplementedError(f"torch import for {type(cfg).__name__}")


def _import_linear(
    sd: Dict[str, np.ndarray], variables: Variables, torch_name: str, flax_path: str
) -> Variables:
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    _set(variables["params"], f"{flax_path}/kernel",
         linear_kernel(sd[f"{torch_name}.weight"]))
    _set(variables["params"], f"{flax_path}/bias", sd[f"{torch_name}.bias"])
    return variables  # HOST tree; consumers upload once (packed)
