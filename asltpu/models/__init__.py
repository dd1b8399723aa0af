"""asltpu.models — flax model zoo for the five capability configs
(``BASELINE.json:6-11``; SURVEY.md §2.2 C5–C11).

All modules follow one protocol: ``module.apply(variables, x, train=False)``
→ ``logits [B, num_classes]``, with fp32 params, configurable compute dtype,
and torch-importable weights (asltpu.ckpt).
"""

from asltpu.models.mobilenetv2 import MobileNetV2  # noqa: F401
from asltpu.models.resnet import ResNet18  # noqa: F401
from asltpu.models.temporal import GRUHead, TransformerHead  # noqa: F401
from asltpu.models.bilstm import PoseBiLSTM  # noqa: F401
from asltpu.models.video import MobileNetV2GRU, ResNet18Transformer  # noqa: F401
from asltpu.models.i3d import I3D  # noqa: F401
from asltpu.models.fusion import TwoStreamFusion  # noqa: F401
