"""asltpu.dist — device mesh + sharding (C16).

The TPU-native communication backend: ``jax.sharding.Mesh`` + jit/GSPMD with
XLA collectives over ICI — the role NCCL/Gloo would play in a GPU framework
(the reference was single-process and had no comms layer at all; SURVEY.md
§5.8).
"""

from asltpu.dist.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from asltpu.dist.tp import (  # noqa: F401
    tp_shard_variables,
    tp_variable_shardings,
    validate_tp_divisibility,
)
