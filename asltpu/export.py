"""Deployment export: serialized inference artifacts (C13 adjunct).

The role TorchScript / ONNX export plays in the torch ecosystem, done the
XLA-native way: the model's full inference program (staged uint8 frames
and/or landmarks → logits, preprocessing included) is exported as portable
StableHLO via :mod:`jax.export`, next to the weights and the config needed
to stage inputs. The artifact is a plain directory:

    program.stablehlo   serialized ``jax.export.Exported`` bytes
    weights.npz         flattened variables ("/"-joined keys)
    meta.json           family, config, input signature, format version

Loading (:func:`load_exported`) needs NO model code — the program is
replayed by XLA from the serialized StableHLO, so a serving fleet can pin
an artifact while the training codebase moves on (jax.export's
backward-compatibility guarantees cover the calling convention and the
guaranteed-stable custom-call set, which includes the Mosaic TPU calls the
fused Pallas preprocess lowers to).

Platform note: the preprocess dispatcher (asltpu.ops.preprocess) routes
between the fused Pallas kernel and the XLA path AT TRACE TIME from the
running backend, so an export targets the platform it was traced on
(recorded in meta.json). Export on the platform you serve on — a TPU
export carries the Pallas lane, a CPU export the XLA lane; both are the
same math (oracle-tested in tests/unit/test_preprocess*.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1

_PROGRAM = "program.stablehlo"
_WEIGHTS = "weights.npz"
_META = "meta.json"


def _cfg_to_jsonable(cfg) -> Dict[str, Any]:
    """Frozen-dataclass config → JSON-safe dict (tuples become lists;
    :func:`_cfg_from_jsonable` restores them)."""
    return dataclasses.asdict(cfg)


def _tuplify(d: Dict[str, Any]) -> Dict[str, Any]:
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}


def _cfg_from_jsonable(family: str, cfg_dict: Dict[str, Any]):
    """Rebuild the frozen config through the SAME constructor path user
    code uses (config.get_config), so config-time validation reruns."""
    from asltpu.config import get_config

    fields = _tuplify(dict(cfg_dict))
    # The dataclass ``name`` field duplicates the registry key (asserted at
    # export time); get_config takes the key positionally.
    fields.pop("name", None)
    pp = fields.pop("preprocess", None)
    if pp is not None:
        fields["preprocess"] = _tuplify(pp)
    return get_config(family, **fields)


def _input_specs(cfg, batch_size: int) -> List[Tuple[str, Tuple[int, ...], str]]:
    """(name, shape, dtype) for each program input after ``variables``,
    matching :meth:`asltpu.api.Model.raw_apply_fn`'s signature."""
    from asltpu.config import PoseBiLSTMConfig, TwoStreamFusionConfig

    specs: List[Tuple[str, Tuple[int, ...], str]] = []
    pp = getattr(cfg, "preprocess", None)
    if not isinstance(cfg, PoseBiLSTMConfig):
        specs.append((
            "frames",
            (batch_size, pp.num_frames, *pp.staged_frame_shape),
            "uint8",
        ))
    if isinstance(cfg, (PoseBiLSTMConfig, TwoStreamFusionConfig)):
        t = pp.num_frames if pp is not None else cfg.num_frames
        specs.append((
            "landmarks",
            (batch_size, t, cfg.num_landmarks, cfg.landmark_dim),
            "float32",
        ))
    return specs


def export_model(
    model,
    path: str,
    batch_size: int = 8,
    platforms: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """Serialize ``model``'s inference program + weights + config to ``path``.

    The program is the fused one-XLA-program contract path
    (:meth:`Model.raw_apply_fn` under one ``jax.jit``) at a FIXED
    ``batch_size`` — the package's static-shape discipline; callers pad
    short batches (:func:`asltpu.data.pad.pad_to_batch`) exactly like the
    serving layer does. ``platforms`` defaults to the current backend
    (see the module docstring for why that is the meaningful target).

    Returns the meta dict that was written.
    """
    import jax
    from jax import export as jax_export

    if platforms is None:
        platforms = [jax.default_backend()]

    fn = jax.jit(model.raw_apply_fn())
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        jax.device_get(model.variables),
    )
    in_specs = _input_specs(model.cfg, batch_size)
    arg_specs = [
        jax.ShapeDtypeStruct(shape, np.dtype(dt)) for _, shape, dt in in_specs
    ]

    disabled: List[str] = []
    try:
        exp = jax_export.export(fn, platforms=platforms)(var_specs, *arg_specs)
    except ValueError as e:
        # A custom call outside jax.export's guaranteed-stable set (the
        # Mosaic TPU calls ARE in it; this is a forward-compat escape
        # hatch, recorded in meta so the artifact says so).
        msg = str(e)
        if "custom_call" not in msg and "Cannot serialize" not in msg:
            raise
        disabled = ["custom_call"]
        exp = jax_export.export(
            fn,
            platforms=platforms,
            disabled_checks=[
                jax_export.DisabledSafetyCheck.custom_call(t)
                for t in _custom_call_targets(msg)
            ],
        )(var_specs, *arg_specs)

    from asltpu.api import _flatten_state

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(bytes(exp.serialize()))
    np.savez(
        os.path.join(path, _WEIGHTS),
        **_flatten_state(jax.device_get(model.variables)),
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "family": model.cfg.name,
        "config": _cfg_to_jsonable(model.cfg),
        "batch_size": batch_size,
        "platforms": platforms,
        "inputs": [
            {"name": n, "shape": list(s), "dtype": d} for n, s, d in in_specs
        ],
        "num_classes": model.cfg.num_classes,
        "jax_version": jax.__version__,
        "disabled_safety_checks": disabled,
    }
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, _META))  # meta last, atomically:
    # a directory with meta.json is a COMPLETE artifact (loader contract).
    return meta


def _custom_call_targets(err_msg: str) -> List[str]:
    """Best-effort extraction of the offending custom-call target names
    from jax.export's error text; falls back to the known TPU targets."""
    import re

    targets = re.findall(r"custom_call target ['\"]([\w.]+)['\"]", err_msg)
    return targets or ["tpu_custom_call"]


@dataclasses.dataclass
class ExportedModel:
    """A loaded deployment artifact: callable inference, no model code.

    ``predict_batch`` runs the exported program at its fixed batch size;
    ``predict`` is the one-clip convenience (pads, runs, slices — the same
    idiom the serving layer uses).
    """

    meta: Dict[str, Any]
    cfg: Any
    variables: Dict[str, Any]
    exported: Any  # jax.export.Exported

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def takes_rgb(self) -> bool:
        return any(i["name"] == "frames" for i in self.meta["inputs"])

    @property
    def takes_landmarks(self) -> bool:
        return any(i["name"] == "landmarks" for i in self.meta["inputs"])

    @property
    def preprocess(self):
        return getattr(self.cfg, "preprocess", None)

    def _check(self, name: str, arr, batch: bool):
        spec = next(i for i in self.meta["inputs"] if i["name"] == name)
        want = tuple(spec["shape"]) if batch else tuple(spec["shape"][1:])
        got = tuple(np.shape(arr))
        if got != want:
            raise ValueError(
                f"{name} shape {got} != exported {'batch ' if batch else ''}"
                f"spec {want}"
            )
        return np.asarray(arr, dtype=spec["dtype"])

    def predict_batch(self, frames=None, landmarks=None) -> np.ndarray:
        """Full fixed-size batch in → logits [B, num_classes] out."""
        args = []
        if self.takes_rgb:
            args.append(self._check("frames", frames, batch=True))
        if self.takes_landmarks:
            args.append(self._check("landmarks", landmarks, batch=True))
        return np.asarray(self.exported.call(self.variables, *args))

    def predict(self, frames=None, landmarks=None,
                gloss_names=None) -> Tuple[Any, np.ndarray]:
        """One staged clip (no batch dim) → (gloss, logits[num_classes])."""
        from asltpu.api import gloss_label
        from asltpu.data.pad import pad_to_batch

        kw = {}
        if self.takes_rgb:
            arr = self._check("frames", frames, batch=False)
            kw["frames"] = pad_to_batch(arr[None], self.batch_size)
        if self.takes_landmarks:
            arr = self._check("landmarks", landmarks, batch=False)
            kw["landmarks"] = pad_to_batch(arr[None], self.batch_size)
        logits = self.predict_batch(**kw)[0]
        return gloss_label(int(logits.argmax()), gloss_names), logits


def load_exported(path: str) -> ExportedModel:
    """Load a :func:`export_model` artifact directory."""
    from jax import export as jax_export

    from asltpu.api import _unflatten_state

    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise IOError(
            f"not an export artifact (no {_META}): {path}"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise IOError(
            f"unsupported artifact format_version={meta.get('format_version')}"
            f" (this asltpu reads {FORMAT_VERSION})"
        )
    with open(os.path.join(path, _PROGRAM), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    with np.load(os.path.join(path, _WEIGHTS)) as z:
        variables = _unflatten_state({k: z[k] for k in z.files})
    cfg = _cfg_from_jsonable(meta["family"], meta["config"])
    return ExportedModel(
        meta=meta, cfg=cfg, variables=variables, exported=exported
    )
