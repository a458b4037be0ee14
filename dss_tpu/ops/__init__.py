from .filters import (
    design_bandpass,
    design_bandstop,
    design_hga_cascade,
    sosfilt,
    sosfilt_scan,
    sosfilt_parallel,
    sosfilt_zi,
    zero_zi,
)
from .frames import (
    StreamingFramer,
    log_power_frames,
    num_windows,
    window_starts,
    framer_step,
    framer_carry_init,
    first_packet_warmup_frames,
    LOG_POWER_EPS,
)
from .car import (
    CommonAverageReferencing,
    BadChannelCorrection,
    ZScoreNormalization,
)
from .hga import HighGammaExtractor, FrontendState

__all__ = [
    "design_bandpass",
    "design_bandstop",
    "design_hga_cascade",
    "sosfilt",
    "sosfilt_scan",
    "sosfilt_parallel",
    "sosfilt_zi",
    "zero_zi",
    "StreamingFramer",
    "log_power_frames",
    "num_windows",
    "window_starts",
    "framer_step",
    "framer_carry_init",
    "first_packet_warmup_frames",
    "LOG_POWER_EPS",
    "CommonAverageReferencing",
    "BadChannelCorrection",
    "ZScoreNormalization",
    "HighGammaExtractor",
    "FrontendState",
]
