"""Leveled logging (sonLib st_log equivalent).

The reference logs through sonLib's st_setLogLevelFromString /
st_logInfo / st_logDebug (cPecanRealign.c:507, impl/pairwiseAligner.c:1267)
with levels OFF / CRITICAL / INFO / DEBUG.  Same surface here, backed by
the stdlib logging module so it composes with absl/jax logging.
"""

import logging
import sys

_LEVELS = {
    "OFF": logging.CRITICAL + 10,
    "CRITICAL": logging.CRITICAL,
    "INFO": logging.INFO,
    "DEBUG": logging.DEBUG,
}

_logger = logging.getLogger("cpecan_tpu")
if not _logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(levelname)s %(name)s: %(message)s"))
    _logger.addHandler(_h)
    _logger.setLevel(_LEVELS["OFF"])  # silent by default, like sonLib
    _logger.propagate = False


def set_log_level(level):
    """st_setLogLevelFromString: accepts OFF/CRITICAL/INFO/DEBUG (case
    insensitive) or None (OFF)."""
    name = (level or "OFF").upper()
    if name not in _LEVELS:
        raise ValueError(f"unknown log level {level!r}; "
                         f"expected one of {sorted(_LEVELS)}")
    _logger.setLevel(_LEVELS[name])


def get_log_level():
    for name, lv in _LEVELS.items():
        if _logger.level == lv:
            return name
    return logging.getLevelName(_logger.level)


def log_critical(msg, *args):
    _logger.critical(msg, *args)


def log_info(msg, *args):
    """st_logInfo."""
    _logger.info(msg, *args)


def log_debug(msg, *args):
    """st_logDebug."""
    _logger.debug(msg, *args)


def get_logger(name=None):
    return _logger if name is None else _logger.getChild(name)
