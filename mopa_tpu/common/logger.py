"""Colored console + file logger.

Mirrors the reference logger's behaviour (``mopa/common/utils/logger.py:10-110``):
a module-level cached setup, abbreviated root names, colored WARNING/ERROR tags
on the console and a plain-text mirror to a log file.
"""

import functools
import logging
import os
import sys


class _ColorfulFormatter(logging.Formatter):
    COLORS = {"WARNING": "\033[33m", "ERROR": "\033[31m\033[4m", "CRITICAL": "\033[31m\033[4m"}
    RESET = "\033[0m"

    def __init__(self, fmt, datefmt, root_name="", abbrev_name=""):
        self._root_name = root_name + "."
        self._abbrev_name = (abbrev_name + ".") if abbrev_name else ""
        super().__init__(fmt, datefmt)

    def formatMessage(self, record):
        record.name = record.name.replace(self._root_name, self._abbrev_name)
        log = super().formatMessage(record)
        color = self.COLORS.get(record.levelname)
        if color:
            prefix = color + record.levelname + self.RESET
            log = log.replace(record.levelname, prefix, 1)
        return log


@functools.lru_cache()
def setup_logger(name="mopa_tpu", output=None, *, color=True, abbrev_name=None):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if abbrev_name is None:
        abbrev_name = name

    plain_formatter = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%m/%d %H:%M:%S"
    )

    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    if color:
        ch.setFormatter(
            _ColorfulFormatter(
                "[%(asctime)s] %(name)s %(levelname)s: %(message)s",
                datefmt="%m/%d %H:%M:%S",
                root_name=name,
                abbrev_name=abbrev_name,
            )
        )
    else:
        ch.setFormatter(plain_formatter)
    logger.addHandler(ch)

    if output is not None:
        filename = output
        if output.endswith(".txt") or output.endswith(".log"):
            filename = output
        else:
            filename = os.path.join(output, "log.txt")
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(plain_formatter)
        logger.addHandler(fh)

    return logger


def get_logger(output=None, abbrev_name="MoPA"):
    """Reference-compatible entry point (``mopa/common/utils/logger.py:55``)."""
    return setup_logger("mopa_tpu", output, abbrev_name=abbrev_name)
