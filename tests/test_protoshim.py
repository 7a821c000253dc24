"""Wire-format conformance pins for the from-spec protobuf runtime shim
(streaming/_protoshim). The JVM's standard protobuf runtime is the
canonical peer at query time; these pins lock the encoding rules the
public spec mandates so a shim edit cannot silently drift:

* tag = (field_number << 3) | wire_type, varint little-endian 7-bit;
* proto3 implicit-presence scalars at default value are NOT serialized;
* oneof members and message fields serialize when set, even if empty;
* negative int32/int64 go out as 10-byte two's-complement varints;
* unknown fields and packed repeated varints parse without error.

Skipped wholesale when the real google.protobuf runtime is installed
(the generated pb2 module then never touches the shim)."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

_SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ndl_core_data_pipeline_spark",
    "streaming",
    "_protoshim",
)


@pytest.fixture(scope="module")
def sm():
    from ndl_core_data_pipeline_spark.streaming.protoshim import (
        _have_real_runtime,
    )

    if _have_real_runtime():
        pytest.skip("real protobuf runtime present; shim not in play")
    if _SHIM not in sys.path:
        sys.path.insert(0, _SHIM)
    return importlib.import_module(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )


def test_kwarg_construct_serialize_roundtrip(sm):
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="totals",
                valueStateUpdate=sm.ValueStateUpdate(value=b"\x01\x02"),
            )
        )
    )
    raw = req.SerializeToString()
    # hand-derived from the spec: field 3 (stateVariableRequest) LEN;
    # nested field 1 (valueStateCall) LEN; stateName field 1 LEN 6;
    # valueStateUpdate field 4 LEN { value field 1 LEN 2 }
    assert raw == bytes.fromhex("1a100a0e0a06746f74616c7322040a020102")
    r2 = sm.StateRequest()
    r2.ParseFromString(raw)
    call = r2.stateVariableRequest.valueStateCall
    assert call.stateName == "totals"
    assert call.valueStateUpdate.value == b"\x01\x02"


def test_proto3_default_scalars_not_serialized(sm):
    # statusCode=0, errorMessage="", value=b"" are all defaults with
    # implicit presence -> empty payload
    assert sm.StateResponse(
        statusCode=0, errorMessage="", value=b""
    ).SerializeToString() == b""
    # non-default scalar serializes
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_empty_message_field_keeps_presence(sm):
    # Exists() carries no fields, but the oneof member's tag + zero
    # length MUST go out or the JVM sees no method set
    raw = sm.MapStateCall(stateName="t", exists=sm.Exists()).SerializeToString()
    assert raw == bytes.fromhex("0a01741200")


def test_negative_int64_two_complement(sm):
    m = sm.RegisterTimer(expiryTimestampMs=-1)
    raw = m.SerializeToString()
    assert raw == b"\x08" + b"\xff" * 9 + b"\x01"
    r = sm.RegisterTimer()
    r.ParseFromString(raw)
    assert r.expiryTimestampMs == -1


def test_repeated_bytes_and_message(sm):
    resp = sm.StateResponseWithListGet(
        value=[b"a", b"bb"], requireNextFetch=True
    )
    r = sm.StateResponseWithListGet()
    r.ParseFromString(resp.SerializeToString())
    assert list(r.value) == [b"a", b"bb"]
    assert r.requireNextFetch is True
    kv = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ]
    )
    r2 = sm.StateResponseWithMapIterator()
    r2.ParseFromString(kv.SerializeToString())
    assert [(p.key, p.value) for p in r2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert r2.requireNextFetch is False  # absent -> proto3 default


def test_unknown_fields_skipped(sm):
    # field 15 varint + field 14 LEN (both unknown to StateResponse),
    # then a real statusCode=7
    raw = (
        bytes([15 << 3 | 0, 5])
        + bytes([14 << 3 | 2, 3])
        + b"abc"
        + b"\x08\x07"
    )
    r = sm.StateResponse()
    r.ParseFromString(raw)
    assert r.statusCode == 7


def test_enum_constants_and_handle_state(sm):
    assert [
        sm.PRE_INIT,
        sm.CREATED,
        sm.INITIALIZED,
        sm.DATA_PROCESSED,
        sm.TIMER_PROCESSED,
        sm.CLOSED,
    ] == [0, 1, 2, 3, 4, 5]
    raw = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    ).SerializeToString()
    assert raw == bytes.fromhex("12040a020803")


def test_oneof_set_clears_siblings(sm):
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    call.exists = sm.Exists()  # same oneof `method`
    raw = call.SerializeToString()
    # only `exists` (field 2) remains alongside stateName
    assert raw == bytes.fromhex("0a01731200")
