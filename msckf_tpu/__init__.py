"""msckf_tpu — TPU-native monocular visual-inertial MSCKF (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of
ValerioSpagnoli/Monocular-Visual-Inertial-MSCKF as a fixed-shape, scan-based
JAX filter library. See SURVEY.md for the layer map and the numerics contract
this build honors.
"""

from msckf_tpu.config import MSCKFConfig, NOISE_PRESETS, reference_experiment_config
from msckf_tpu.filter.msckf import (
    camera_step,
    make_initial_state,
    run_filter,
    run_sequence,
)
from msckf_tpu.filter.propagation import propagate
from msckf_tpu.filter.state import FilterState, init_state

__version__ = "0.1.0"

__all__ = [
    "MSCKFConfig",
    "NOISE_PRESETS",
    "reference_experiment_config",
    "FilterState",
    "init_state",
    "make_initial_state",
    "propagate",
    "camera_step",
    "run_filter",
    "run_sequence",
    "__version__",
]
