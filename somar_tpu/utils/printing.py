"""Logging / observability: per-process logs, rank-filtered stdout, colors.

Re-design of the reference's Printing.H (`/root/reference/src/utils/
Printing.H`): pout() per-rank log files (Chombo parstream), tout(n)
rank-filtered terminal output (:68), the ANSI color namespace (:87-129),
and writeTextFile dumps.  In the single-program jax world "rank" means
jax.process_index() (multi-host pods); single-host runs behave like
rank 0.
"""

from __future__ import annotations

import os
import sys
from typing import Optional


class color:
    """ANSI colors (reference: Printing.H color:: namespace)."""
    reset = "\033[0m"
    black = "\033[30m"
    red = "\033[31m"
    green = "\033[32m"
    yellow = "\033[33m"
    blue = "\033[34m"
    magenta = "\033[35m"
    cyan = "\033[36m"
    white = "\033[37m"
    hired = "\033[91m"
    higreen = "\033[92m"
    hiyellow = "\033[93m"
    hiblue = "\033[94m"


_pout_file = None


def _rank() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def set_pout_dir(path: str):
    """Point the pout.<rank> log at a run directory (the RunDriver's
    out_dir); resets any open stream."""
    global _pout_file
    if _pout_file is not None:
        _pout_file.close()
        _pout_file = None
    os.environ["SOMAR_POUT_DIR"] = path


def pout(*args, **kw):
    """Per-process log file pout.<rank> (reference: Chombo parstream)."""
    global _pout_file
    if _pout_file is None:
        path = os.environ.get("SOMAR_POUT_DIR", ".")
        _pout_file = open(os.path.join(path, f"pout.{_rank()}"), "a")
    print(*args, file=_pout_file, **kw)
    _pout_file.flush()


def tout(*args, rank: int = 0, verbosity: int = 1,
         min_verbosity: int = 1, **kw):
    """Rank-filtered terminal output (reference: Printing.H:68): printed
    only on the given process and when verbosity >= min_verbosity."""
    if _rank() == rank and verbosity >= min_verbosity:
        print(*args, **kw)
        sys.stdout.flush()


def write_text_file(path: str, array, fmt: str = "%.8g"):
    """Plain-text field dump (reference: writeTextFile)."""
    import numpy as np

    np.savetxt(path, np.asarray(array).reshape(-1), fmt=fmt)
