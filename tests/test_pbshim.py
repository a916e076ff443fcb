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


def test_autovivify_nested_singular_write(state_module):
    """The standard generated-code idiom `msg.sub.field = x` must stick —
    PySpark's stateful_processor_api_client writes TTL exactly this way
    (`state_call_command.ttl.durationMs = ...`)."""
    ns = state_module
    cmd = ns["StateCallCommand"]()
    cmd.stateName = "s"
    # a mere read of a singular message field does NOT register presence
    _ = cmd.ttl
    assert not cmd.HasField("ttl")
    # ...but a write through the returned child does
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    assert cmd.ttl.durationMs == 5000
    back = ns["StateCallCommand"]()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 5000
    # vivification chains through multiple levels and repeated appends
    req = ns["StateRequest"]()
    req.stateVariableRequest.valueStateCall.stateName = "deep"
    assert req.HasField("stateVariableRequest")
    assert req.stateVariableRequest.valueStateCall.stateName == "deep"


def test_oneof_vivify_clears_siblings(state_module):
    """Vivifying a detached oneof child (write through a reference obtained
    BEFORE a sibling was set) must clear the sibling — never two members of
    one oneof present at once."""
    ns = state_module
    req = ns["StateRequest"]()
    svr = req.stateVariableRequest  # detached child of the 'method' oneof
    req.timerRequest = ns["TimerRequest"]()
    assert req.WhichOneof("method") == "timerRequest"
    svr.valueStateCall.stateName = "late"  # late write through the old ref
    assert req.WhichOneof("method") == "stateVariableRequest"
    assert not req.HasField("timerRequest")


def test_copyfrom_deep_and_read_eq(state_module):
    """CopyFrom must deep-copy (no aliasing of nested/repeated state), and
    merely reading fields must not make a message compare unequal."""
    ns = state_module
    src = ns["StateCallCommand"](stateName="a")
    src.ttl.durationMs = 10
    dst = ns["StateCallCommand"]()
    dst.CopyFrom(src)
    dst.ttl.durationMs = 99
    assert src.ttl.durationMs == 10  # no aliasing
    fresh = ns["StateResponseWithListGet"]()
    touched = ns["StateResponseWithListGet"]()
    _ = touched.value  # read caches an empty repeated list
    assert fresh == touched
    touched.value.append(b"x")  # list mutation registers presence
    assert fresh != touched
    assert touched.SerializeToString() != b""


def test_real_protobuf_wire_compat(state_module):
    """If the real protobuf is installed, the same StateRequest built through
    both runtimes must serialize byte-identically and cross-parse (when only
    the shim exists, the JVM state server in the streaming tws test covers
    wire compat instead)."""
    import importlib.util

    spec = None
    try:
        spec = importlib.util.find_spec("google.protobuf.descriptor_pool")
    except Exception:
        pass
    if spec is None or _PBSHIM in (spec.origin or ""):
        pytest.skip("real protobuf not installed; JVM cross-check covers wire compat")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as real_pb2

    ns = state_module

    def build(mod_get):
        req = mod_get("StateRequest")()
        req.version = 2
        call = req.stateVariableRequest.valueStateCall
        call.stateName = "compat"
        call.valueStateUpdate.value = b"\x01\x02"
        return req

    shim_req = build(lambda n: ns[n])
    real_req = build(lambda n: getattr(real_pb2, n))
    shim_wire = shim_req.SerializeToString()
    real_wire = real_req.SerializeToString()
    assert shim_wire == real_wire
    # cross-parse both directions
    shim_back = ns["StateRequest"]()
    shim_back.ParseFromString(real_wire)
    assert shim_back.stateVariableRequest.valueStateCall.stateName == "compat"
    real_back = real_pb2.StateRequest()
    real_back.ParseFromString(shim_wire)
    assert real_back.stateVariableRequest.valueStateCall.stateName == "compat"


def test_copyfrom_into_detached_child_marks_present(state_module):
    """`parent.sub.CopyFrom(x)` on a lazily-vivified child is a mutation:
    the real runtime registers `sub` on the parent (HasField True, field
    serialized) — even when x is empty.  The shim previously populated
    _values without _mark_present, silently dropping the subtree."""
    ns = state_module
    src = ns["TTLConfig"]()
    src.durationMs = 1234
    cmd = ns["StateCallCommand"]()
    cmd.ttl.CopyFrom(src)
    assert cmd.HasField("ttl")
    assert cmd.ttl.durationMs == 1234
    back = ns["StateCallCommand"]()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 1234

    # MergeFromString through a detached child registers too
    cmd2 = ns["StateCallCommand"]()
    cmd2.ttl.MergeFromString(src.SerializeToString())
    assert cmd2.HasField("ttl") and cmd2.ttl.durationMs == 1234

    # CopyFrom of an EMPTY message still sets presence (real-runtime rule)
    cmd3 = ns["StateCallCommand"]()
    cmd3.ttl.CopyFrom(ns["TTLConfig"]())
    assert cmd3.HasField("ttl")
