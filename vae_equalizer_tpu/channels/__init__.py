"""L1 channel simulators: AWGN-ISI (SISO) and linear optical dual-pol (MIMO)."""

from .presets import CHANNEL_PRESETS, upsample_ir, channel_ir
from .awgn import make_awgn_simulator
from .optical_dp import make_dp_simulator

__all__ = [
    "CHANNEL_PRESETS",
    "upsample_ir",
    "channel_ir",
    "make_awgn_simulator",
    "make_dp_simulator",
]
