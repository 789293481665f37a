"""Per-outdir run logging (reference: python logging to run.log /
quant_inference_run.log in each output dir, t2v/scripts/ptq.py:49-59)."""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(save_dir: str, name: str = "run") -> logging.Logger:
    os.makedirs(save_dir, exist_ok=True)
    logger = logging.getLogger(f"viditq.{name}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(save_dir, f"{name}.log"))
    fh.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(message)s"))
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(logging.Formatter("[viditq] %(message)s"))
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def log_invocation(logger: logging.Logger, args) -> None:
    """Record the CLI invocation for reproducibility (the reference also
    snapshots its config + source tree into the outdir; we record args and
    the git revision)."""
    import subprocess
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.dirname(__file__)))
                             ).stdout.strip()
    except Exception:
        rev = "unknown"
    logger.info("invocation: %s", vars(args))
    logger.info("revision: %s", rev)
