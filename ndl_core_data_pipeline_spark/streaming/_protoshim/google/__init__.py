"""Namespace package root for the from-spec protobuf runtime shim (see
google/protobuf/_shim_impl.py for provenance). Declared pkgutil-style so
a real `google.*` distribution appearing later on sys.path still wins
for its own subpackages."""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
