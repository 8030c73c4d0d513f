"""Channel-bank tracking engine (DLL/PLL, vectorized over channels)."""

from .loop_filters import calc_loop_coef, calc_loop_coef_carr3  # noqa: F401
from .engine import (ChannelState, TrackOutputs, init_channel_state,  # noqa: F401
                     track, track_superblock)
from .cno import cno_vsm, cno_nwpr  # noqa: F401
from .multi import track_multi, track_superblock_multi  # noqa: F401
