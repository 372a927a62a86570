"""Order-preserving multiprocess map for preprocessing pipelines.

Same contract as the reference's ``chunked_multiprocess_run``
(reference: utils/multiprocess_utils.py:23-56): fan a list of argument
tuples over worker processes and yield results *in submission order* as they
become ready. Implemented on ``concurrent.futures`` instead of hand-rolled
queues; workers that raise produce ``None`` (with a traceback print), matching
the reference's skip-on-error behavior.
"""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, Iterable, List


def _trampoline(fn: Callable, args):
    try:
        return fn(*args)
    except Exception:
        traceback.print_exc()
        return None


def chunked_multiprocess_run(fn: Callable, args_list: List, num_workers: int = None,
                             ordered: bool = True) -> Iterable:
    """Yield ``fn(*args)`` for each args tuple, in order, using a process pool.

    ``num_workers <= 1`` degrades to an inline loop (no fork overhead), which
    also keeps worker code debuggable under pytest.
    """
    if num_workers is None:
        num_workers = int(os.getenv("N_PROC", os.cpu_count() or 1))
    if num_workers <= 1:
        for args in args_list:
            yield _trampoline(fn, args)
        return
    with ProcessPoolExecutor(max_workers=num_workers) as pool:
        futures = [pool.submit(_trampoline, fn, args) for args in args_list]
        for fut in futures:
            yield fut.result()
