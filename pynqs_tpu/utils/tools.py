"""Run-reproducibility helpers (reference utils/tools.py:167-191
`dump_input` + platform header)."""

from __future__ import annotations

import os
import platform
import subprocess
import sys
import time

__all__ = ["repro_header", "dump_input"]


def repro_header() -> str:
    """Platform / jax / git one-block header for run logs."""
    import jax

    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        git = "unknown"
    lines = [
        f"pynqs_tpu git={git}",
        f"python {sys.version.split()[0]} on {platform.platform()}",
        f"jax {jax.__version__} backend={jax.default_backend()} "
        f"devices={len(jax.devices())}",
        f"started {time.strftime('%Y-%m-%d %H:%M:%S')}",
    ]
    return "\n".join(lines)


def dump_input(logger=None, script_path: str | None = None):
    """Log the header and (optionally) the full input script, like the
    reference's reproducibility dump."""
    out = repro_header()
    if script_path is None and sys.argv and os.path.exists(sys.argv[0]):
        script_path = sys.argv[0]
    if script_path and os.path.exists(script_path):
        with open(script_path) as f:
            out += "\n----- input script -----\n" + f.read()
    if logger is not None:
        logger.info(out)
    else:
        print(out)
    return out
