"""Descriptor module stand-in. Generated pb2 modules read exactly one
symbol at import time: `_USE_C_DESCRIPTORS` (False routes them down the
pure-python path whose only other dependency is the builder)."""

_USE_C_DESCRIPTORS = False
_SPARK_GRAFT_SHIM = True
