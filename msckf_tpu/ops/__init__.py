from msckf_tpu.ops import (  # noqa: F401
    camera,
    geometry,
    pallas_kernels,
    precision,
    smallmat,
    triangulation,
)
