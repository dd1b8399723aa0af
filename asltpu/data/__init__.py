"""asltpu.data — host-side IO: video decode (C1), WLASL index (C15),
double-buffered host→device prefetch (C3), synthetic fixtures.
"""

from asltpu.data.decode import decode_clip, decode_sampled_frames  # noqa: F401
from asltpu.data.prefetch import Prefetcher  # noqa: F401
from asltpu.data.wlasl import WLASLIndex  # noqa: F401
