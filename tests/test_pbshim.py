"""Unit tests for the vendored minimal protobuf runtime (pbshim).

pbshim only activates when the real protobuf wheel is absent; these tests
exercise the shim directly (import from the vendored path) so they hold
even if a future container ships real protobuf.
"""

import os
import sys

import pytest

from native_sql_engine_spark.vendor import (  # noqa: E402
    _PBSHIM_DIR as _PBSHIM,
    enable_protobuf_shim,
)

# proper activation (sys.path AND worker PYTHONPATH) — a bare sys.path insert
# here would make the driver see protobuf while executor workers don't
enable_protobuf_shim()

from google.protobuf.internal import codec as C  # noqa: E402
from google.protobuf.internal.runtime import build_file  # noqa: E402
from google.protobuf.internal.schema import parse_file_descriptor  # noqa: E402


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -(2**31)):
        enc = C.enc_varint(v)
        dec, pos = C.dec_varint(enc, 0)
        assert pos == len(enc)
        assert C.signed64(dec) == v
    # negatives use the full 10-byte two's-complement form (spec)
    assert len(C.enc_varint(-1)) == 10


def test_zigzag():
    assert C.zigzag_enc(0) == 0
    assert C.zigzag_enc(-1) == 1
    assert C.zigzag_enc(1) == 2
    for v in (0, -1, 1, -(2**30), 2**30):
        assert C.zigzag_dec(C.zigzag_enc(v)) == v


@pytest.fixture(scope="module")
def state_module():
    """Build the real PySpark StateMessage schema through the shim path."""
    import re

    import pyspark.sql.streaming.proto as proto_pkg

    src = open(
        os.path.join(os.path.dirname(proto_pkg.__file__), "StateMessage_pb2.py"), "rb"
    ).read()
    m = re.search(rb"AddSerializedFile\(\s*(b'(?:[^'\\]|\\.)*')\s*\)", src, re.S)
    assert m, "embedded FileDescriptorProto not found"
    serialized = eval(m.group(1))  # the b'...' literal from the generated file
    schema = parse_file_descriptor(serialized)
    ns: dict = {}
    build_file(schema, ns, "state_test")
    return ns


def test_parse_pyspark_state_schema(state_module):
    ns = state_module
    assert "StateRequest" in ns and "StateResponse" in ns
    assert ns["PRE_INIT"] == 0 and ns["INITIALIZED"] == 2 and ns["CLOSED"] == 5
    assert ns["HandleState"].Name(4) == "TIMER_PROCESSED"


def test_nested_roundtrip_and_oneof(state_module):
    ns = state_module
    req = ns["StateRequest"](
        version=3,
        stateVariableRequest=ns["StateVariableRequest"](
            valueStateCall=ns["ValueStateCall"](stateName="s", exists=ns["Exists"]())
        ),
    )
    wire = req.SerializeToString()
    back = ns["StateRequest"]()
    back.ParseFromString(wire)
    assert back.version == 3
    assert back.stateVariableRequest.valueStateCall.stateName == "s"
    assert back.stateVariableRequest.valueStateCall.HasField("exists")
    assert back.WhichOneof("method") == "stateVariableRequest"
    # setting another oneof member clears the first
    req.timerRequest = ns["TimerRequest"]()
    assert req.WhichOneof("method") == "timerRequest"
    assert not req.HasField("stateVariableRequest")


def test_empty_message_field_is_emitted(state_module):
    """ValueStateCall(exists=Exists()) must serialize the empty submessage —
    presence of the oneof arm IS the protocol signal."""
    ns = state_module
    wire = ns["ValueStateCall"](stateName="x", exists=ns["Exists"]()).SerializeToString()
    # field 2 (exists), wire type 2, length 0 → bytes 0x12 0x00 present
    assert b"\x12\x00" in wire


def test_repeated_and_default_skipping(state_module):
    ns = state_module
    resp = ns["StateResponseWithListGet"](
        statusCode=0, value=[b"a", b"bb"], requireNextFetch=False
    )
    wire = resp.SerializeToString()
    # proto3: statusCode=0 and requireNextFetch=False are defaults → skipped
    back = ns["StateResponseWithListGet"]()
    back.ParseFromString(wire)
    assert back.statusCode == 0
    assert list(back.value) == [b"a", b"bb"]
    assert back.requireNextFetch is False


def test_real_protobuf_wire_compat(state_module):
    """If the real protobuf is installed, pbshim's bytes must parse there
    and vice versa (cross-validated via the JVM state server in the
    streaming tws test when only the shim exists)."""
    real = None
    try:
        sys_path = [p for p in sys.path if p != _PBSHIM]
        import importlib.util

        spec = importlib.util.find_spec("google.protobuf.descriptor_pool")
        if spec and _PBSHIM not in (spec.origin or ""):
            real = spec
    except Exception:
        pass
    if real is None:
        pytest.skip("real protobuf not installed; JVM cross-check covers wire compat")
