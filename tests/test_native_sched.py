"""Native C++ scheduler: decision-for-decision equality with the Python
reference scheduler under a randomized continuous-batching workload."""

import numpy as np
import pytest

from ggml_cuda_experiments_tpu.models import llama
from ggml_cuda_experiments_tpu.models.config import PRESETS
from ggml_cuda_experiments_tpu.models.engine import Engine
from ggml_cuda_experiments_tpu.utils import native_sched

pytestmark = pytest.mark.skipif(not native_sched.available(),
                                reason="libgct_native.so not built")

CFG = PRESETS["debug"]


def test_scheduler_unit_decisions():
    s = native_sched.NativeScheduler(max_batch=2, n_pages=6,
                                     pages_per_seq=4, page_size=16,
                                     max_seq_len=64)
    s.add_request(0, prompt_len=10, max_new_tokens=6)     # needs 1 page
    s.add_request(1, prompt_len=30, max_new_tokens=40)    # 64/16 = 4 pages
    s.add_request(2, prompt_len=5, max_new_tokens=5)      # blocked: slots
    adm = s.admit()
    assert [(r, sl) for r, sl, _ in adm] == [(0, 0), (1, 1)]
    assert list(adm[0][2]) == [0, 6, 6, 6]                # 6 == trash page
    assert list(adm[1][2]) == [1, 2, 3, 4]
    assert s.num_waiting == 1 and s.num_running == 2
    assert s.num_free_pages == 1

    # rid 0 finishes after 5 more steps (prefill token + 5 == 6)
    hit = np.zeros(2, np.uint8)
    fins = [s.step_complete(hit) for _ in range(5)]
    assert fins[:4] == [[]] * 4
    assert fins[4] == [(0, 0)]
    # its page came back and rid 2 can now admit into slot 0
    adm2 = s.admit()
    assert [(r, sl) for r, sl, _ in adm2] == [(2, 0)]
    # FIFO free list: the never-used page 5 sits ahead of the released
    # page 0 (free = [5, 0]), matching engine.py PageAllocator exactly
    assert list(adm2[0][2]) == [5, 6, 6, 6]


def test_eos_and_capacity():
    s = native_sched.NativeScheduler(max_batch=4, n_pages=8,
                                     pages_per_seq=2, page_size=16,
                                     max_seq_len=32)
    for rid in range(3):
        s.add_request(rid, 4, 20)
    assert len(s.admit()) == 3
    hit = np.zeros(4, np.uint8)
    hit[1] = 1                                           # slot 1 hits EOS
    assert s.step_complete(hit) == [(1, 1)]
    lengths, table = s.state()
    # trash id == n_pages when constructed directly (the Engine passes
    # usable pages = n_pages-1 so ids line up with its own trash page)
    assert lengths[1] == 1 and np.all(table[1] == 8)     # reset


def _run_engine(scheduler: str, rng):
    params = llama.init_weights(CFG, seed=0)
    eng = Engine(params, CFG, max_batch=3, page_size=16, n_pages=17,
                 max_seq_len=96, scheduler=scheduler)
    rids = []
    for i in range(7):
        plen = int(rng.integers(3, 12))
        prompt = list(rng.integers(0, CFG.vocab_size, plen))
        rids.append(eng.add_request(prompt,
                                    max_new_tokens=int(rng.integers(2, 9))))
    done = eng.run_to_completion()
    return done, eng


def test_engine_native_matches_python():
    done_py, eng_py = _run_engine("python", np.random.default_rng(42))
    done_nat, eng_nat = _run_engine("native", np.random.default_rng(42))
    assert done_py.keys() == done_nat.keys()
    for rid in done_py:
        assert done_py[rid] == done_nat[rid], f"rid {rid}"
    # allocators ended in the same state
    assert sorted(eng_py.allocator.free) == \
        sorted(range(eng_py.trash_page))
    assert eng_nat._nsched.num_free_pages == eng_py.trash_page
