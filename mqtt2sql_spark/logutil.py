"""B6 logging surface — verbosity levels + strftime-named logfiles.

Mirrors the reference's behavior (mqtt2sql.py:368-423): ``-v`` / ``-d``
are repeatable counts; the logfile NAME is passed through
``time.strftime`` at every write, so a pattern like
``/var/log/mqtt2sql-%Y%m%d.log`` rotates daily with zero rotation
machinery.  Re-expressed on stdlib ``logging`` so Spark/py4j loggers can
be tuned from the same switches.
"""

from __future__ import annotations

import logging
import time


class StrftimeFileHandler(logging.Handler):
    """Appends each record to ``time.strftime(pattern)`` resolved at emit
    time — the reference's per-write open/expand/close (mqtt2sql.py:403-407),
    which makes date-patterned logfiles self-rotating."""

    def __init__(self, pattern: str) -> None:
        super().__init__()
        self.pattern = pattern

    def emit(self, record: logging.LogRecord) -> None:
        try:
            filename = time.strftime(self.pattern, time.localtime())
            with open(filename, "a") as f:
                f.write(self.format(record) + "\n")
        except Exception:
            self.handleError(record)


def configure_logging(
    verbose: int = 0, debug: int = 0, logfile: str | None = None
) -> logging.Logger:
    """Map the reference's count-style switches onto logging levels:
    default WARNING (LogLevel.ALWAYS analogue), ``-v`` ⇒ INFO,
    ``-d`` ⇒ DEBUG (the reference's debug>=4 ⇒ logging.DEBUG collapses —
    Spark's own log4j noise makes finer grades pointless here)."""
    level = logging.WARNING
    if verbose > 0:
        level = logging.INFO
    if debug > 0:
        level = logging.DEBUG
    logger = logging.getLogger("mqtt2sql_spark")
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    # replace handlers idempotently (re-invocation in one process)
    logger.handlers.clear()
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    logger.addHandler(stream)
    if logfile:
        fh = StrftimeFileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
