"""Runtime utilities: platform detection, tensor I/O, harness, benchmarking."""

from ggml_cuda_experiments_tpu.utils.platform import (
    interpret_default,
    on_tpu,
)
