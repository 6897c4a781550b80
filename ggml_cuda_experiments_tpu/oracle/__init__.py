"""CPU oracles: pure NumPy reference implementations of every kernel.

The analog of the reference's ``src/utils.h`` CPU oracle (``mulmat_cpu``,
single-pass online ``softmax``) — every Pallas kernel in ``ops/`` is validated
against these with hard tolerance asserts (the reference only eyeballs
max-abs-diff, see SURVEY.md §4).
"""

from ggml_cuda_experiments_tpu.oracle.attention import (
    attention_ref,
    mulmat_ref,
    online_softmax_ref,
    softmax_ref,
)
from ggml_cuda_experiments_tpu.oracle import quant as quant_ref
