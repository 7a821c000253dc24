"""Descriptor pool stand-in: AddSerializedFile parses the embedded
FileDescriptorProto bytes with the from-spec TLV walker (descriptor.proto
field numbers are public) and returns a FileDesc the builder consumes."""

from . import _shim_impl


class _Pool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, serialized: bytes):
        fd = _shim_impl.FileDesc(serialized)
        self._files[fd.name] = fd
        return fd


_DEFAULT = _Pool()


def Default() -> _Pool:
    return _DEFAULT
