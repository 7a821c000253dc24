"""From-spec minimal protobuf runtime — just enough to back pyspark's
generated ``StateMessage_pb2`` module where the real ``protobuf`` wheel
is absent (this sandbox; round-18 verdict item 4: the
transformWithStateInPandas hostile twins were permanently gated on it).

Everything here derives from PUBLIC documentation only:

* the protobuf wire format (protobuf.dev/programming-guides/encoding):
  varint and length-delimited records, tag = (field_number << 3) | wire
  type, two's-complement 64-bit varints for negative ints;
* the published ``descriptor.proto`` schema (field numbers of
  FileDescriptorProto/DescriptorProto/FieldDescriptorProto/
  EnumDescriptorProto), used to parse the serialized file descriptor
  that generated ``*_pb2`` modules embed;
* the generated-code API surface the pb2 module + pyspark state clients
  actually exercise: kwarg construction, attribute get/set,
  ``SerializeToString``, ``ParseFromString``, repeated fields,
  module-level enum constants.

Deliberately NOT implemented (StateMessage.proto uses none of them, and
a silent wrong answer would be worse than a loud error): groups, maps,
packed repeated message fields, fixed32/64, floats, sint zigzag,
extensions, services, unknown-field retention, text format. Unsupported
field types raise ``NotImplementedError`` at build time.

The JVM side of the transformWithState state-server protocol is the
canonical peer: every request this shim serializes is parsed by the
standard Java protobuf runtime, so the hostile-twin battery doubles as
a wire-format conformance check.
"""

from __future__ import annotations

_SPARK_GRAFT_SHIM = True

# --- wire-format primitives (public encoding spec) ---------------------

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _tag(number: int, wt: int) -> bytes:
    return _varint((number << 3) | wt)


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = _read_varint(data, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_LEN:
        ln, pos = _read_varint(data, pos)
        return pos + ln
    if wt == _WT_I32:
        return pos + 4
    raise ValueError(f"cannot skip wire type {wt}")


def _parse_tlv(data: bytes) -> dict[int, list]:
    """Generic tag/value walk: field number -> list of raw values
    (int for varint, bytes for LEN) in occurrence order."""
    fields: dict[int, list] = {}
    pos, end = 0, len(data)
    while pos < end:
        tag, pos = _read_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            v, pos = _read_varint(data, pos)
        elif wt == _WT_LEN:
            ln, pos = _read_varint(data, pos)
            v = data[pos : pos + ln]
            pos += ln
        else:
            pos = _skip(data, pos, wt)
            continue
        fields.setdefault(num, []).append(v)
    return fields


def _s(fields: dict, num: int, default: str = "") -> str:
    return fields[num][-1].decode("utf-8") if num in fields else default


def _i(fields: dict, num: int, default: int = 0) -> int:
    return fields[num][-1] if num in fields else default


# --- descriptor model (descriptor.proto field numbers, public) ---------

# FieldDescriptorProto.Type values we support
TYPE_INT64, TYPE_UINT64, TYPE_INT32 = 3, 4, 5
TYPE_BOOL, TYPE_STRING, TYPE_MESSAGE = 8, 9, 11
TYPE_BYTES, TYPE_UINT32, TYPE_ENUM = 12, 13, 14
LABEL_REPEATED = 3

_VARINT_TYPES = frozenset(
    {TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_BOOL, TYPE_UINT32, TYPE_ENUM}
)
_SIGNED_TYPES = frozenset({TYPE_INT64, TYPE_INT32, TYPE_ENUM})
_SUPPORTED_TYPES = _VARINT_TYPES | {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}

_SCALAR_DEFAULTS = {
    TYPE_INT64: 0,
    TYPE_UINT64: 0,
    TYPE_INT32: 0,
    TYPE_UINT32: 0,
    TYPE_ENUM: 0,
    TYPE_BOOL: False,
    TYPE_STRING: "",
    TYPE_BYTES: b"",
}


class FieldDesc:
    __slots__ = (
        "name",
        "number",
        "label",
        "type",
        "type_name",
        "oneof_index",
        "proto3_optional",
        "message_cls",
    )

    def __init__(self, fields: dict):
        # FieldDescriptorProto: name=1 number=3 label=4 type=5
        # type_name=6 oneof_index=9 proto3_optional=17
        self.name = _s(fields, 1)
        self.number = _i(fields, 3)
        self.label = _i(fields, 4)
        self.type = _i(fields, 5)
        self.type_name = _s(fields, 6)
        self.oneof_index = fields[9][-1] if 9 in fields else None
        self.proto3_optional = bool(_i(fields, 17))
        self.message_cls = None  # resolved by the builder
        if self.type not in _SUPPORTED_TYPES:
            raise NotImplementedError(
                f"protoshim: unsupported field type {self.type} "
                f"for field {self.name!r}"
            )

    @property
    def has_explicit_presence(self) -> bool:
        # proto3: oneof members, optional-marked scalars, and message
        # fields serialize when SET even at default value; implicit-
        # presence scalars at default are skipped
        return (
            self.oneof_index is not None
            or self.proto3_optional
            or self.type == TYPE_MESSAGE
        )


class MsgDesc:
    """Message descriptor. Doubles as the `_MESSAGENAME` placeholder the
    generated module pokes `_serialized_start/_loaded_options` onto —
    attribute sets must therefore be allowed (no __slots__)."""

    def __init__(self, fields: dict, prefix: str):
        self.name = _s(fields, 1)
        self.full_name = f"{prefix}.{self.name}" if prefix else self.name
        self.fields = [FieldDesc(_parse_tlv(raw)) for raw in fields.get(2, [])]
        self.nested = [
            MsgDesc(_parse_tlv(raw), self.full_name)
            for raw in fields.get(3, [])
        ]
        self.enums = [
            EnumDesc(_parse_tlv(raw), self.full_name)
            for raw in fields.get(4, [])
        ]
        self.oneofs = [
            _s(_parse_tlv(raw), 1) for raw in fields.get(8, [])
        ]


class EnumDesc:
    def __init__(self, fields: dict, prefix: str):
        self.name = _s(fields, 1)
        self.full_name = f"{prefix}.{self.name}" if prefix else self.name
        # EnumValueDescriptorProto: name=1 number=2
        self.values = [
            (_s(f, 1), _i(f, 2))
            for f in (_parse_tlv(raw) for raw in fields.get(2, []))
        ]


class FileDesc:
    def __init__(self, serialized: bytes):
        fields = _parse_tlv(serialized)
        # FileDescriptorProto: name=1 package=2 message_type=4
        # enum_type=5 syntax=12
        self.name = _s(fields, 1)
        self.package = _s(fields, 2)
        self.syntax = _s(fields, 12, "proto2")
        self.messages = [
            MsgDesc(_parse_tlv(raw), self.package)
            for raw in fields.get(4, [])
        ]
        self.enums = [
            EnumDesc(_parse_tlv(raw), self.package)
            for raw in fields.get(5, [])
        ]


# --- message runtime ---------------------------------------------------


class ShimMessage:
    """Generated-message stand-in: kwarg construction, field attribute
    access with proto3 defaults, SerializeToString / ParseFromString."""

    DESCRIPTOR: MsgDesc = None
    _fields_by_name: dict = {}
    _fields_by_number: dict = {}
    _fields_sorted: list = []

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    def __setattr__(self, k, v):
        if k.startswith("_"):
            object.__setattr__(self, k, v)
            return
        fd = self._fields_by_name.get(k)
        if fd is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {k!r}"
            )
        if fd.label == LABEL_REPEATED:
            v = list(v)
        elif fd.type == TYPE_MESSAGE and not isinstance(v, ShimMessage):
            raise TypeError(
                f"field {k!r} expects a message, got {type(v).__name__}"
            )
        if fd.oneof_index is not None:
            # setting a oneof member clears its siblings
            for other in self._fields_sorted:
                if (
                    other.oneof_index == fd.oneof_index
                    and other.name != k
                ):
                    self._values.pop(other.name, None)
        self._values[k] = v

    def __getattr__(self, k):
        # reached only when normal lookup fails (i.e. not _values etc.)
        fd = type(self)._fields_by_name.get(k)
        if fd is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {k!r}"
            )
        vals = object.__getattribute__(self, "_values")
        if k in vals:
            return vals[k]
        if fd.label == LABEL_REPEATED:
            lst: list = []
            vals[k] = lst
            return lst
        if fd.type == TYPE_MESSAGE:
            return fd.message_cls()
        return _SCALAR_DEFAULTS[fd.type]

    # -- wire out
    def SerializeToString(self) -> bytes:
        chunks = []
        for fd in self._fields_sorted:
            if fd.name not in self._values:
                continue
            v = self._values[fd.name]
            if fd.label == LABEL_REPEATED:
                for item in v:
                    chunks.append(_encode_field(fd, item))
                continue
            if (
                not fd.has_explicit_presence
                and v == _SCALAR_DEFAULTS[fd.type]
            ):
                continue  # proto3 implicit presence: defaults not sent
            chunks.append(_encode_field(fd, v))
        return b"".join(chunks)

    # -- wire in
    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        self._merge(data)
        return len(data)

    def _merge(self, data: bytes) -> None:
        pos, end = 0, len(data)
        while pos < end:
            tag, pos = _read_varint(data, pos)
            num, wt = tag >> 3, tag & 7
            fd = self._fields_by_number.get(num)
            if fd is None:
                pos = _skip(data, pos, wt)
                continue
            if wt == _WT_VARINT and fd.type in _VARINT_TYPES:
                iv, pos = _read_varint(data, pos)
                vals = [_from_varint(fd, iv)]
            elif wt == _WT_LEN:
                ln, pos = _read_varint(data, pos)
                raw = bytes(data[pos : pos + ln])
                pos += ln
                if fd.type == TYPE_STRING:
                    vals = [raw.decode("utf-8")]
                elif fd.type == TYPE_BYTES:
                    vals = [raw]
                elif fd.type == TYPE_MESSAGE:
                    m = fd.message_cls()
                    m._merge(raw)
                    vals = [m]
                elif fd.label == LABEL_REPEATED:
                    # packed repeated varints
                    vals, p2 = [], 0
                    while p2 < len(raw):
                        iv, p2 = _read_varint(raw, p2)
                        vals.append(_from_varint(fd, iv))
                else:
                    raise ValueError(
                        f"LEN payload for scalar field {fd.name!r}"
                    )
            else:
                pos = _skip(data, pos, wt)
                continue
            if fd.label == LABEL_REPEATED:
                getattr(self, fd.name).extend(vals)
            else:
                self._values[fd.name] = vals[-1]

    def __repr__(self):  # debugging aid only
        vals = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({vals})"


def _from_varint(fd: FieldDesc, iv: int):
    if fd.type == TYPE_BOOL:
        return bool(iv)
    if fd.type in _SIGNED_TYPES and iv >= 1 << 63:
        iv -= 1 << 64
    return iv


def _encode_field(fd: FieldDesc, v) -> bytes:
    if fd.type in _VARINT_TYPES:
        return _tag(fd.number, _WT_VARINT) + _varint(int(v))
    if fd.type == TYPE_STRING:
        b = v.encode("utf-8")
        return _tag(fd.number, _WT_LEN) + _varint(len(b)) + b
    if fd.type == TYPE_BYTES:
        b = bytes(v)
        return _tag(fd.number, _WT_LEN) + _varint(len(b)) + b
    if fd.type == TYPE_MESSAGE:
        b = v.SerializeToString()
        return _tag(fd.number, _WT_LEN) + _varint(len(b)) + b
    raise NotImplementedError(f"protoshim: cannot encode type {fd.type}")


# --- class building ----------------------------------------------------


def make_message_class(md: MsgDesc) -> type:
    cls = type(
        md.name,
        (ShimMessage,),
        {
            "DESCRIPTOR": md,
            "_fields_by_name": {f.name: f for f in md.fields},
            "_fields_by_number": {f.number: f for f in md.fields},
            "_fields_sorted": sorted(md.fields, key=lambda f: f.number),
        },
    )
    return cls


def resolve_message_fields(
    classes_by_full_name: dict[str, type],
) -> None:
    for cls in classes_by_full_name.values():
        for fd in cls._fields_sorted:
            if fd.type == TYPE_MESSAGE:
                # type_name is fully qualified with a leading dot
                key = fd.type_name.lstrip(".")
                try:
                    fd.message_cls = classes_by_full_name[key]
                except KeyError:
                    raise NotImplementedError(
                        f"protoshim: cross-file message type {key!r} "
                        "not supported (single-file descriptor only)"
                    ) from None
