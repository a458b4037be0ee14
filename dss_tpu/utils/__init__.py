from .channels import (
    SelectElectrodesFromBothGrids,
    SelectElectrodesOverSpeechAreas,
    BOTH_GRIDS_ORDER,
    SPEECH_AREA_CHANNELS,
    IMG_LAYOUT,
    speech_grid,
    motor_grid,
    default_layout,
)
from .cv import LeaveOneDayOut
from .hdf import save_data_to_hdf, load_hdf
from .bci2000 import (
    BCI2000MatFile,
    Experiment,
    SyllableRepetition,
    KeywordReading,
    ExperimentMapping,
)
from .audio import peak_normalize, write_wav, read_wav

__all__ = [
    "SelectElectrodesFromBothGrids",
    "SelectElectrodesOverSpeechAreas",
    "BOTH_GRIDS_ORDER",
    "SPEECH_AREA_CHANNELS",
    "IMG_LAYOUT",
    "speech_grid",
    "motor_grid",
    "default_layout",
    "LeaveOneDayOut",
    "save_data_to_hdf",
    "load_hdf",
    "BCI2000MatFile",
    "Experiment",
    "SyllableRepetition",
    "KeywordReading",
    "ExperimentMapping",
    "peak_normalize",
    "write_wav",
    "read_wav",
]
