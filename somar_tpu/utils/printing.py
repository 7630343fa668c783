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


_host_callbacks_ok: Optional[bool] = None


def supports_host_callbacks() -> bool:
    """True when the active jax backend can lower jax.debug.print /
    jax.debug.callback (host send/recv).  The axon PJRT tunnel used for
    single-chip TPU access cannot ("UNIMPLEMENTED: axon_pjrt does not
    support host send/recv callbacks"), so inside-jit verbosity traces
    (MG residual lines, NaN sweeps) must degrade to no-ops there instead
    of killing the run.  Overridable with SOMAR_HOST_CALLBACKS=0/1."""
    global _host_callbacks_ok
    if _host_callbacks_ok is None:
        env = os.environ.get("SOMAR_HOST_CALLBACKS")
        if env is not None:
            _host_callbacks_ok = env != "0"
        else:
            # functional probe: the axon plugin still reports platform
            # "tpu", so the only reliable detection is to try one
            try:
                import jax
                import jax.numpy as jnp

                def _probe(x):
                    jax.debug.print("", x=x)
                    return x

                jax.block_until_ready(
                    jax.jit(_probe)(jnp.zeros((), jnp.float32)))
                _host_callbacks_ok = True
            except Exception:
                _host_callbacks_ok = False
    return _host_callbacks_ok


def debug_print(fmt: str, **kw):
    """jax.debug.print that no-ops (at trace time) on backends without
    host-callback support rather than failing to compile."""
    if supports_host_callbacks():
        import jax
        jax.debug.print(fmt, **kw)


def write_text_file(path: str, array, fmt: str = "%.8g"):
    """Plain-text field dump (reference: writeTextFile)."""
    import numpy as np

    np.savetxt(path, np.asarray(array).reshape(-1), fmt=fmt)
