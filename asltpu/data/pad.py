"""Batch padding for compiled static-shape programs (one implementation).

Every inference/serve/train lane in this package runs ONE jitted program at
a fixed batch size (XLA static shapes; per-size recompiles are the
alternative) and pads short batches up to it, slicing results back to the
kept count afterwards. Round 3's review campaign found a real bug (eval
remainder dropping) in one of ~6 hand-rolled copies of that idiom; this
module is the single shared implementation (round-4 VERDICT item #6).
"""

from __future__ import annotations

from typing import Union

import numpy as np


def pad_to_batch(
    arr: np.ndarray, batch: int, fill: Union[str, int, float] = "repeat"
) -> np.ndarray:
    """Pad axis 0 of ``arr`` up to ``batch`` rows.

    ``fill="repeat"``: repeat the last row — the padding for DATA rows
    (frames / landmarks / mirrored labels), where pad rows must be valid
    model inputs; callers slice outputs back to the kept count.

    ``fill=<scalar>``: pad with a constant, e.g. ``-1`` for label rows so
    eval masks the padding out of its counts.

    A full batch is returned unchanged (same object — no copy).
    Raises ``ValueError`` on an empty array with ``fill="repeat"`` (there
    is no row to repeat; callers skip empty batches instead) and on an
    array already longer than ``batch`` (always a caller bug).
    """
    n = arr.shape[0]
    if n == batch:
        return arr
    if n > batch:
        raise ValueError(f"batch has {n} rows, more than batch size {batch}")
    pad = batch - n
    if isinstance(fill, str):
        if fill != "repeat":
            raise ValueError(f"fill must be 'repeat' or a scalar, got {fill!r}")
        if n == 0:
            raise ValueError("cannot repeat-pad an empty batch")
        return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
    return np.concatenate(
        [arr, np.full((pad, *arr.shape[1:]), fill, arr.dtype)]
    )
