from msckf_tpu.filter.msckf import (  # noqa: F401
    camera_step,
    frame_step,
    make_initial_state,
    run_filter,
    run_sequence,
)
from msckf_tpu.filter.propagation import propagate, propagate_block  # noqa: F401
from msckf_tpu.filter.state import FilterState, init_state  # noqa: F401
